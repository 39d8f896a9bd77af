"""Occupancy-grid projection as a gather-based inverse sensor model.

Re-design of the reference's ``occupancy_grid_utils`` ray overlay
(``map_projection/src/graph_grid_mapper.cpp:295-401``).  Instead of
marching every (node, bearing) ray and scatter-adding sampled cells — TPU
scatters cost ~a tile access per index, which made the 500-node rebuild
~190 ms — the evidence is computed per (cell, node) pair: each cell looks
up the scan range at its own bearing bin (one gather from a tiny (B,)
table), classifies itself free / occupied / unknown, and the per-node
contributions reduce with a plain sum.  No scatters at all; the weight
``res·B / (2π·d)`` reproduces the ray overlay's density (near cells are
crossed by many rays), so log-odds magnitudes match the reference's
Bresenham accumulation.  Incremental projection (only new nodes) with
drift-triggered full rebuild mirrors ``:305-308``; node positions are
marked known-free as in ``:330-344``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


@dataclasses.dataclass(frozen=True)
class GridConfig:
    resolution: float = 0.05     # m/cell (slam.yaml:17-19)
    size: int = 256              # cells per side
    max_range: float = 6.0       # slam.yaml:42-43
    hit_logodds: float = 0.85
    miss_logodds: float = -0.4
    clamp: float = 10.0
    drift_dist: float = 0.5      # full-rebuild trigger (graph_grid_mapper.cpp:305-308)
    drift_angle_deg: float = 5.0


class OccupancyGrid(NamedTuple):
    logodds: jax.Array       # (size, size)
    origin: jax.Array        # (2,) world coords of cell (0, 0)
    last_projected: jax.Array  # () int32 — nodes [0, last) already projected
    ref_poses: jax.Array     # (N, 7) node poses at last projection (drift check)


def grid_init(g: GraphState, config: GridConfig = GridConfig()) -> OccupancyGrid:
    half = config.size * config.resolution / 2
    return OccupancyGrid(
        logodds=jnp.zeros((config.size, config.size)),
        origin=jnp.array([-half, -half]),
        last_projected=jnp.zeros((), dtype=jnp.int32),
        ref_poses=lie.pose_identity((g.node_capacity,)),
    )


def auto_origin(g: GraphState, config: GridConfig) -> jax.Array:
    """Center the grid on the graph bounding box (``:535-573``)."""
    t = lie.pose_t(g.pose)
    big = 1e9
    mn = jnp.min(jnp.where(g.node_valid[:, None], t[:, :2], big), axis=0)
    mx = jnp.max(jnp.where(g.node_valid[:, None], t[:, :2], -big), axis=0)
    center = 0.5 * (mn + mx)
    half = config.size * config.resolution / 2
    return center - half


def _project_rays(
    logodds: jax.Array,
    poses: jax.Array,       # (M, 7) node poses
    scans: jax.Array,       # (M, B) ranges
    mask: jax.Array,        # (M,) project this node?
    origin: jax.Array,
    config: GridConfig,
    node_chunk: int = 64,
) -> jax.Array:
    """Accumulate every node's scan evidence into the grid — matmul-only.

    TPU gathers/scatters cost ~a tile access per index, which made both
    the ray-march scatter (191 ms @ 500 nodes) and a per-cell gather
    (303 ms) slow.  This formulation runs entirely on the MXU:

    1. Each node is snapped to its containing cell (≤ res/2 error) and
       conceptually pinned at the grid CENTER, where the per-cell distance
       ``D`` and bearing-bin ``bin0`` tables are static trace-time
       constants.
    2. The per-cell range lookup becomes ``scan_rot @ P`` with
       ``P[b, cell] = (bin0[cell] == b)`` — a one-hot (B, size²) matmul.
       Node yaw is folded in by pre-rotating the scan an integer number of
       bins (≤ half a bin error).
    3. Free/occupied evidence is elementwise in the static tables; each
       node's centered evidence plane is then translated to its true cell
       by batched one-hot row/column shift matmuls (out-of-range rows
       produce zeros, so clipping is automatic) and summed over nodes.

    A finite return inside max_range marks its endpoint cell occupied; a
    finite return BEYOND max_range still carves free space up to
    max_range (the reference ray overlay does the same).  Only rays with
    no return at all (inf) carry no evidence.  Contributions are weighted
    by the number of rays that would cross the cell (``res·B / (2π·d)``)
    so magnitudes match the reference's Bresenham ray-overlay
    accumulation.  Nodes run in chunks of ``node_chunk`` under
    ``lax.scan`` to bound the (chunk, size²) intermediates.
    """
    import numpy as np

    m, b = scans.shape
    size = config.size
    res = config.resolution
    max_range = config.max_range
    BIG = 1e9  # inf sentinel: keeps 0·inf out of the one-hot matmul

    # --- static center-pinned tables (numpy, trace-time) ---
    c0 = size // 2
    off = (np.arange(size) - c0) * res
    dxs = np.broadcast_to(off[None, :], (size, size)).reshape(-1)
    dys = np.broadcast_to(off[:, None], (size, size)).reshape(-1)
    D = np.sqrt(dxs * dxs + dys * dys).astype(np.float32)          # (size²,)
    bin0 = np.mod(
        np.floor((np.arctan2(dys, dxs) + np.pi) * (b / (2 * np.pi))).astype(np.int64),
        b,
    ).astype(np.int32)
    Wray = (res * b / (2 * np.pi * np.maximum(D, res))).astype(np.float32)
    D = jnp.asarray(D)
    Wray = jnp.asarray(Wray)
    # one-hot bin selection, built on device from the static index table
    P = (jnp.asarray(bin0)[None, :] == jnp.arange(b)[:, None]).astype(jnp.float32)

    yaw = lie.yaw_of(lie.pose_q(poses))                      # (M,)
    px = lie.pose_t(poses)[:, 0]
    py = lie.pose_t(poses)[:, 1]
    cx = jnp.floor((px - origin[0]) / res).astype(jnp.int32)  # node cell
    cy = jnp.floor((py - origin[1]) / res).astype(jnp.int32)

    # integer-bin scan rotation: world bin = bin0 - round(yaw/δ)
    kbin = jnp.round(yaw * (b / (2 * jnp.pi))).astype(jnp.int32)
    src = jnp.mod(jnp.arange(b)[None, :] - kbin[:, None], b)
    scan_rot = jnp.take_along_axis(
        jnp.where(jnp.isfinite(scans), scans, BIG), src, axis=1
    )

    chunk = min(node_chunk, m)
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m

    def padz(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    scs = padz(scan_rot).reshape(n_chunks, chunk, b)
    msk = padz(mask.astype(jnp.float32)).reshape(n_chunks, chunk)
    cxs = padz(cx).reshape(n_chunks, chunk)
    cys = padz(cy).reshape(n_chunks, chunk)

    rows = jnp.arange(size)

    def body(acc, xs):
        sc, mk, cxc, cyc = xs
        # DEFAULT (single-pass bf16) matmul precision throughout: P and the
        # shift matrices are EXACT one-hot selections at any precision, so
        # rounding only touches the selected values (~0.4% of range /
        # log-odds — well under a cell)
        rng = jnp.dot(sc, P)                                 # (chunk, size²)
        has = rng < BIG * 0.5
        reach = jnp.minimum(rng, max_range)
        free = has & (D[None, :] < reach - res)
        # endpoint band widened to 0.71·res: the cell CONTAINING the ray
        # endpoint has center distance up to rng + res·√2/2
        occ = has & (rng <= max_range) & (jnp.abs(D[None, :] - rng) < 0.71 * res)
        E = Wray[None, :] * (
            free * config.miss_logodds + occ * config.hit_logodds
        ) * mk[:, None]
        E = E.reshape(-1, size, size)
        # translate center→true cell: one-hot shifts (no wraparound — out-
        # of-range rows/cols have all-zero one-hots and vanish)
        sy = (cyc - c0)[:, None, None]
        sx = (cxc - c0)[:, None, None]
        Ry = (rows[None, None, :] == rows[None, :, None] - sy).astype(E.dtype)
        Cx = (rows[None, :, None] == rows[None, None, :] - sx).astype(E.dtype)
        E = jnp.einsum("mrp,mpc->mrc", Ry, E)
        E = jnp.einsum("mrp,mpc->mrc", E, Cx)
        return acc + jnp.sum(E, axis=0), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((size, size)), (scs, msk, cxs, cys)
    )
    return jnp.clip(logodds + acc, -config.clamp, config.clamp)


def _mark_node_cells(logodds, poses, mask, origin, config: GridConfig):
    """Robot footprint cells are known-free (``:330-344``)."""
    res = config.resolution
    size = config.size
    t = lie.pose_t(poses)
    cx = jnp.floor((t[:, 0] - origin[0]) / res).astype(jnp.int32)
    cy = jnp.floor((t[:, 1] - origin[1]) / res).astype(jnp.int32)
    inside = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size) & mask
    cell = jnp.where(inside, cy * size + cx, size * size)
    flat = jnp.zeros((size * size + 1,))
    flat = flat.at[cell].add(2.0 * config.miss_logodds)
    return jnp.clip(logodds + flat[:-1].reshape(size, size), -config.clamp, config.clamp)


def project(
    grid: OccupancyGrid,
    g: GraphState,
    scans: jax.Array,
    scan_valid: jax.Array,
    config: GridConfig = GridConfig(),
    force_full: bool = False,
    recenter: bool = True,
) -> OccupancyGrid:
    """Project the graph's scans into the grid.

    Incremental: only nodes at slots ≥ ``last_projected`` are rendered,
    unless any already-projected node drifted more than the threshold since
    the last projection — then the whole map is rebuilt from scratch
    (``occupancy_grid_projector.cpp:52-76``). A full rebuild also recenters
    the grid on the graph bounding box (the reference's map auto-sizing,
    ``graph_grid_mapper.cpp:535-573``) unless ``recenter=False``."""
    n = g.node_capacity
    slots = jnp.arange(n)

    dt, dr = lie.pose_distance(g.pose, grid.ref_poses)
    already = (slots < grid.last_projected) & g.node_valid
    drifted = jnp.any(
        already
        & ((dt > config.drift_dist) | (jnp.degrees(dr) > config.drift_angle_deg))
    )
    # incremental path rays only a static window of recent slots (a full
    # (N, B, S) raycast per call would make 'incremental' cost the same
    # compute/memory as a rebuild); too many new nodes forces a rebuild
    window = min(64, n)
    full = (
        drifted
        | jnp.asarray(force_full)
        | (g.num_nodes - grid.last_projected > window)
    )

    def project_full(_):
        mask = g.node_valid & scan_valid
        org = auto_origin(g, config) if recenter else grid.origin
        lo = _project_rays(
            jnp.zeros_like(grid.logodds), g.pose, scans, mask, org, config
        )
        return _mark_node_cells(lo, g.pose, mask, org, config), org

    def project_incremental(_):
        start = jnp.clip(g.num_nodes - window, 0, n - window)
        p_w = jax.lax.dynamic_slice(g.pose, (start, 0), (window, 7))
        s_w = jax.lax.dynamic_slice(scans, (start, 0), (window, scans.shape[1]))
        m_w = (
            jax.lax.dynamic_slice_in_dim(g.node_valid & scan_valid, start, window)
            & (start + jnp.arange(window) >= grid.last_projected)
        )
        lo = _project_rays(grid.logodds, p_w, s_w, m_w, grid.origin, config)
        return _mark_node_cells(lo, p_w, m_w, grid.origin, config), grid.origin

    lo, origin = jax.lax.cond(full, project_full, project_incremental, None)

    return OccupancyGrid(
        logodds=lo,
        origin=origin,
        last_projected=jnp.maximum(grid.last_projected, g.num_nodes),
        # snapshot poses of everything projected so far for the drift check
        ref_poses=jnp.where(
            ((slots < jnp.maximum(grid.last_projected, g.num_nodes))
             & g.node_valid)[:, None] | full,
            g.pose, grid.ref_poses,
        ),
    )


def occupancy_probability(grid: OccupancyGrid) -> jax.Array:
    """Log-odds -> probability map in [0, 1]; 0.5 = unknown."""
    return jax.nn.sigmoid(grid.logodds)


def to_ternary(grid: OccupancyGrid, occ_thresh: float = 0.65, free_thresh: float = 0.35):
    """ROS-style -1/0/100 occupancy classes."""
    p = occupancy_probability(grid)
    unknown = jnp.abs(grid.logodds) < 1e-6
    return jnp.where(unknown, -1, jnp.where(p > occ_thresh, 100, jnp.where(p < free_thresh, 0, -1)))
