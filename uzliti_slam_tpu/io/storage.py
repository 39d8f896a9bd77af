"""Graph persistence: checkpoint / resume of the full SLAM state.

Replaces the reference's rosbag-per-entity / MongoDB storage backends
(``graph_slam_common/src/rosbag_storage.cpp:62-236``,
``mongodb_storage.cpp:25-60``): the whole SlamState pytree snapshots to a
single compressed npz (poses, edges, descriptor banks, scans), with a JSON
sidecar for metadata.  Like the reference (``graph_slam_node.cpp:875-888``),
place-recognition indexes are part of the saved state, so resume needs no
rebuild.  Atomic write via rename.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np


FORMAT_VERSION = 1


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.name if hasattr(p, "name") else str(p.idx) if hasattr(p, "idx") else str(p)
            for p in path
        )
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state, extra_meta: dict | None = None) -> None:
    """Snapshot any pytree of arrays (SlamState, GraphState, grids...)."""
    os.makedirs(path, exist_ok=True)
    arrays, _ = _flatten_with_paths(state)
    meta = {
        "format_version": FORMAT_VERSION,
        "type": type(state).__name__,
        "keys": sorted(arrays.keys()),
    }
    if extra_meta:
        meta["extra"] = extra_meta

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, os.path.join(path, "snapshot.npz"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    tmp_meta = os.path.join(path, "meta.json.tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp_meta, os.path.join(path, "meta.json"))


def load_state(path: str, template):
    """Restore a pytree saved by ``save_state``. ``template`` supplies the
    structure (e.g. ``pipeline.init_state(config)``); shapes must match the
    checkpoint (same capacities/config)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['format_version']}")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    ordered = []
    with np.load(os.path.join(path, "snapshot.npz")) as data:
        arrays = {k: data[k] for k in data.files}
    data = arrays
    for pathspec, tmpl in flat:
        key = "/".join(
            p.name if hasattr(p, "name") else str(p.idx) if hasattr(p, "idx") else str(p)
            for p in pathspec
        )
        if key not in data:
            raise ValueError(f"checkpoint missing array: {key}")
        arr = data[key]
        tn = np.asarray(tmpl)
        if arr.shape != tn.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs template {tn.shape}"
            )
        ordered.append(jax.numpy.asarray(arr.astype(tn.dtype)))
    return jax.tree_util.tree_unflatten(treedef, ordered)


def checkpoint_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def write_mat(path: str, arrays: dict) -> None:
    """Write named numeric arrays as a MATLAB Level-4 ``.mat`` file.

    Counterpart of the reference's ``Conversions::toMatlab`` export
    (``graph_slam_common/src/conversions.cpp:487``), dependency-free: the
    v4 format is per-matrix ``[type, rows, cols, imag, namelen]`` int32
    header + name + column-major float64 data, readable by MATLAB/Octave
    and ``scipy.io.loadmat``.  Arrays are flattened to 2-D (vectors become
    columns).
    """
    import struct

    with open(path, "wb") as f:
        for name, arr in arrays.items():
            a = np.asarray(arr, dtype=np.float64)
            if a.ndim == 0:
                a = a.reshape(1, 1)
            elif a.ndim == 1:
                a = a.reshape(-1, 1)
            elif a.ndim > 2:
                a = a.reshape(a.shape[0], -1)
            rows, cols = a.shape
            nm = name.encode() + b"\x00"
            # type 0000: little-endian, float64, numeric, full matrix
            f.write(struct.pack("<5i", 0, rows, cols, 0, len(nm)))
            f.write(nm)
            f.write(np.asfortranarray(a).tobytes(order="F"))


def graph_to_mat(path: str, g) -> None:
    """Export a ``GraphState`` to ``.mat`` (poses, odometry, edge table) —
    the graph-level ``toMatlab`` use."""
    write_mat(path, {
        "pose": np.asarray(g.pose),
        "odom_pose": np.asarray(g.odom_pose),
        "stamp": np.asarray(g.stamp),
        "node_valid": np.asarray(g.node_valid),
        "e_from": np.asarray(g.e_from),
        "e_to": np.asarray(g.e_to),
        "e_type": np.asarray(g.e_type),
        "e_valid": np.asarray(g.e_valid),
        "e_error": np.asarray(g.e_error),
        "e_transform": np.asarray(g.e_transform),
        "odom_params": np.asarray(g.odom_params),
    })
