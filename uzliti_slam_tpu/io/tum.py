"""TUM RGB-D dataset format loader.

The reference evaluates against TUM tooling (the unbuilt
``FastfusionProjector`` exports TUM-format keyframes/trajectories,
``graph_slam_common/src/projection/fastfusion_projector.cpp:60-73``).
This module reads the standard TUM RGB-D layout (``rgb.txt``,
``depth.txt``, ``groundtruth.txt`` index files + png frames) and
timestamp-associates streams, and writes TUM trajectory files for offline
ATE evaluation with the standard tools.

PNG decoding needs no external deps: TUM depth/gray pngs are read with a
minimal pure-python PNG reader (16-bit grayscale as the dataset uses);
falls back to imageio/PIL if available.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


DEPTH_SCALE = 5000.0  # TUM: depth png value / 5000 = meters
# TUM freiburg default intrinsics
FR1_INTRINSICS = dict(fx=517.3, fy=516.5, cx=318.6, cy=255.3)


def read_index(path: str) -> list[tuple[float, str]]:
    """Parse a TUM index file (``# comments``, then ``stamp path...``)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1] if len(parts) > 1 else ""))
    return out


def read_groundtruth(path: str) -> list[tuple[float, np.ndarray]]:
    """``stamp tx ty tz qx qy qz qw`` -> (stamp, pose7[t, q_wxyz])."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            t = np.array(v[1:4], dtype=np.float32)
            qx, qy, qz, qw = v[4:8]
            out.append((v[0], np.concatenate([t, [qw, qx, qy, qz]]).astype(np.float32)))
    return out


def associate(
    a: list[tuple[float, str]],
    b: list[tuple[float, str]],
    max_dt: float = 0.02,
):
    """Greedy nearest-timestamp association (the TUM associate.py policy)."""
    bi = 0
    pairs = []
    b_stamps = [x[0] for x in b]
    for sa, pa in a:
        while bi + 1 < len(b) and abs(b_stamps[bi + 1] - sa) <= abs(b_stamps[bi] - sa):
            bi += 1
        if abs(b_stamps[bi] - sa) <= max_dt:
            pairs.append(((sa, pa), b[bi]))
    return pairs


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def read_png_gray(path: str) -> np.ndarray:
    """Minimal PNG reader for 8/16-bit grayscale (TUM depth + gray images).
    RGB images are luminance-converted."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a png: {path}")
    pos = 8
    idat = b""
    meta = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", chunk)
            if interlace:
                raise ValueError("interlaced png unsupported")
            meta = (w, h, bit_depth, color_type)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    w, h, bit_depth, color_type = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels * (bit_depth // 8)
    raw = zlib.decompress(idat)
    stride = w * bpp
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for row in range(h):
        ft = raw[off]
        off += 1
        line = np.frombuffer(raw[off:off + stride], dtype=np.uint8).copy()
        off += stride
        if ft == 1:  # sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # up
            line = (line.astype(np.int32) + prev) % 256
            line = line.astype(np.uint8)
        elif ft == 3:  # average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else np.uint8(0)
                ul = prev[i - bpp] if i >= bpp else np.uint8(0)
                line[i] = (int(line[i]) + int(_paeth(np.uint8(left), prev[i], np.uint8(ul)))) & 0xFF
        img[row] = line
        prev = img[row]
    if bit_depth == 16:
        arr = img.reshape(h, w, channels, 2)
        out = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
        out = out.astype(np.float32)
    else:
        out = img.reshape(h, w, channels).astype(np.float32)
    if channels >= 3:
        out = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    else:
        out = out[..., 0]
    return out


def write_png_gray(path: str, arr: np.ndarray) -> None:
    """Minimal PNG writer for 8-bit (uint8) / 16-bit (uint16) grayscale —
    the TUM wire formats (rgb stored as gray; depth as 16-bit, meters x
    5000). Filter 0 rows + fast zlib; no external deps."""
    arr = np.asarray(arr)
    h, w = arr.shape
    if arr.dtype == np.uint16:
        bit_depth = 16
        body = arr.astype(">u2").tobytes()
        stride = w * 2
    else:
        bit_depth = 8
        body = arr.astype(np.uint8).tobytes()
        stride = w
    rows = b"".join(
        b"\x00" + body[r * stride:(r + 1) * stride] for r in range(h)
    )
    idat = zlib.compress(rows, 1)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", idat))
        f.write(chunk(b"IEND", b""))


def load_sequence(root: str, max_frames: int | None = None, stride: int = 1):
    """Yield dicts of (image, depth, gt_pose, stamp) from a TUM directory."""
    rgb = read_index(os.path.join(root, "rgb.txt"))
    dep = read_index(os.path.join(root, "depth.txt"))
    gt_path = os.path.join(root, "groundtruth.txt")
    gt = read_groundtruth(gt_path) if os.path.exists(gt_path) else []
    # odometry.txt (same trajectory format): the reference's dataset bags
    # carry wheel-odometry topics alongside the camera
    # (iti_slam_launch/launch/dataset.launch:1-36); TUM-format exports from
    # the simulator write it, real TUM sequences lack it (frames then carry
    # odom_pose=None and the caller supplies its own odometry source)
    odo_path = os.path.join(root, "odometry.txt")
    odo = read_groundtruth(odo_path) if os.path.exists(odo_path) else []
    pairs = associate(rgb, dep)
    if stride > 1:
        pairs = pairs[::stride]
    if max_frames:
        pairs = pairs[:max_frames]
    gt_stamps = np.array([g[0] for g in gt]) if gt else None
    odo_stamps = np.array([o[0] for o in odo]) if odo else None
    # Async native data loader (runtime/prefetch.cpp worker pool; python-
    # thread fallback): decode runs AHEAD of the consumer so host IO
    # overlaps device compute — the dataset analog of the reference's C++
    # camera listeners (feature_extraction_service_node.h:44-58).
    from uzliti_slam_tpu.runtime import native

    # 16 frames ahead: the consumer ingests CHUNKS (8 frames per dispatch),
    # so decode must stay ahead of a whole chunk for IO to overlap device
    # compute instead of stalling at each chunk boundary
    ahead = 16
    pf = native.FramePrefetcher(n_threads=2, capacity=ahead + 2,
                                max_pixels=1 << 21)
    try:
        for p in pairs[:ahead]:
            pf.submit(os.path.join(root, p[0][1]), os.path.join(root, p[1][1]))
        for i, ((srgb, prgb), (sdep, pdep)) in enumerate(pairs):
            img, depth = pf.next()
            if i + ahead < len(pairs):
                nxt = pairs[i + ahead]
                pf.submit(os.path.join(root, nxt[0][1]),
                          os.path.join(root, nxt[1][1]))
            depth = depth / DEPTH_SCALE
            pose = None
            if gt:
                gi = int(np.argmin(np.abs(gt_stamps - srgb)))
                if abs(gt_stamps[gi] - srgb) < 0.05:
                    pose = gt[gi][1]
            odom_pose = None
            if odo:
                oi = int(np.argmin(np.abs(odo_stamps - srgb)))
                if abs(odo_stamps[oi] - srgb) < 0.05:
                    odom_pose = odo[oi][1]
            yield dict(
                image=img, depth=depth, stamp=srgb, gt_pose=pose,
                odom_pose=odom_pose,
            )
    finally:
        pf.close()


def write_trajectory(path: str, stamps, poses) -> None:
    """Write a TUM-format trajectory (``stamp tx ty tz qx qy qz qw``) for
    evaluation with the standard TUM tools (the reference's export format,
    ``fastfusion_projector.cpp:60-73``)."""
    poses = np.asarray(poses)
    with open(path, "w") as f:
        f.write("# estimated trajectory (TUM format)\n")
        for s, p in zip(stamps, poses):
            t = p[0:3]
            qw, qx, qy, qz = p[3:7]
            f.write(
                f"{float(s):.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
            )
