"""Virtual 2-D laser scans from depth images, and scan merging.

Array-native re-design of the reference's scan extraction
(``map_projection/src/graph_grid_mapper.cpp:420-468``: back-project depth,
height-band filter, per-bearing nearest range with a far-field max stored in
``intensities``) and polar-space scan merging (``:45-212``).  All per-pixel
loops become masked segment reductions over bearing bins.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class Scan(NamedTuple):
    ranges: jax.Array       # (B,) nearest range per bearing; inf if empty
    far_ranges: jax.Array   # (B,) farthest range ("intensities" far field,
                            # reference laser_transformation_estimator.cpp:176-179)
    angle_min: jax.Array    # ()
    angle_max: jax.Array    # ()

    @property
    def n_bins(self) -> int:
        return self.ranges.shape[0]

    def angles(self) -> jax.Array:
        b = self.ranges.shape[0]
        return self.angle_min + (self.angle_max - self.angle_min) * (
            jnp.arange(b) + 0.5
        ) / b


def _bin_min_max(
    rng_flat: jax.Array,
    ok_flat: jax.Array,
    bins_flat: jax.Array,
    n_bins: int,
    max_range: float,
) -> tuple[jax.Array, jax.Array]:
    """Per-bin (min, max) range via ONE sort of packed (bin, quantized
    range) keys + searchsorted — reliably ~3x faster than two TPU scatter
    reductions at VGA scale, and exact to max_range/2^21 (< 3 um at 6 m).

    Invalid entries sort past the last bin. Returns (near (B,), far (B,))
    with +inf / -inf for empty bins.
    """
    if n_bins > 1023:
        raise ValueError("n_bins must fit 10 bits alongside 21-bit ranges")
    scale = (2.0**21 - 1.0) / (max_range * 1.001)
    q = jnp.clip(rng_flat * scale, 0.0, 2.0**21 - 1.0).astype(jnp.int32)
    key = jnp.where(
        ok_flat, (bins_flat << 21) | q, jnp.int32(n_bins) << 21
    )
    ks = jnp.sort(key)
    edges = jnp.arange(n_bins + 1, dtype=jnp.int32) << 21
    bounds = jnp.searchsorted(ks, edges)
    starts, ends = bounds[:-1], bounds[1:]
    has = ends > starts
    p = ks.shape[0]
    mask = (1 << 21) - 1
    mn = (ks[jnp.clip(starts, 0, p - 1)] & mask).astype(jnp.float32) / scale
    mx = (ks[jnp.clip(ends - 1, 0, p - 1)] & mask).astype(jnp.float32) / scale
    return jnp.where(has, mn, jnp.inf), jnp.where(has, mx, -jnp.inf)


def cloud_to_scan(
    points: jax.Array,
    valid: jax.Array,
    n_bins: int = 360,
    angle_min: float = -jnp.pi,
    angle_max: float = jnp.pi,
    height_band: tuple[float, float] = (0.1, 1.0),
    max_range: float = 6.0,
    min_range: float = 0.3,
) -> Scan:
    """Project a 3-D cloud (already in the robot base frame, z up) to a
    virtual planar scan: per bearing bin, nearest range (obstacle) and
    farthest range (free-space evidence)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    rng = jnp.hypot(x, y)
    bearing = jnp.arctan2(y, x)
    ok = (
        valid
        & (z >= height_band[0])
        & (z <= height_band[1])
        & (rng >= min_range)
        & (rng <= max_range)
        & (bearing >= angle_min)
        & (bearing < angle_max)
    )
    binf = (bearing - angle_min) / (angle_max - angle_min) * n_bins
    bins = jnp.clip(binf.astype(jnp.int32), 0, n_bins - 1)
    near, far = _bin_min_max(
        rng.reshape(-1), ok.reshape(-1), bins.reshape(-1), n_bins, max_range
    )
    return Scan(
        ranges=near,
        far_ranges=jnp.where(jnp.isfinite(far), far, jnp.inf),
        angle_min=jnp.asarray(angle_min, jnp.float32),
        angle_max=jnp.asarray(angle_max, jnp.float32),
    )


def depth_to_scan(
    depth: jax.Array,
    cam,
    cam_pose: jax.Array,
    n_bins: int = 360,
    angle_min: float = -jnp.pi,
    angle_max: float = jnp.pi,
    height_band: tuple[float, float] = (0.1, 1.0),
    max_range: float = 6.0,
    min_range: float = 0.3,
) -> Scan:
    """Depth image -> virtual scan. ``cam_pose`` maps camera frame to robot
    base frame (sensor extrinsic, applied before the height-band filter).

    Plane-separated (SoA) implementation: backprojection and the rigid
    transform run on (H, W) channel planes with an explicit rotation
    matrix, never materializing an (H, W, 3) cloud — a 3-wide minor axis
    pads to the 128-lane TPU tile and costs ~5 ms/frame at VGA.
    """
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xc = (uu - cam.cx) / cam.fx * depth
    yc = (vv - cam.cy) / cam.fy * depth
    zc = depth

    R = lie.quat_to_matrix(lie.pose_q(cam_pose))
    t = lie.pose_t(cam_pose)
    xb = R[0, 0] * xc + R[0, 1] * yc + R[0, 2] * zc + t[0]
    yb = R[1, 0] * xc + R[1, 1] * yc + R[1, 2] * zc + t[1]
    zb = R[2, 0] * xc + R[2, 1] * yc + R[2, 2] * zc + t[2]

    valid = (depth > 0.01) & jnp.isfinite(depth)
    rng = jnp.sqrt(xb * xb + yb * yb)
    bearing = jnp.arctan2(yb, xb)
    ok = (
        valid
        & (zb >= height_band[0])
        & (zb <= height_band[1])
        & (rng >= min_range)
        & (rng <= max_range)
        & (bearing >= angle_min)
        & (bearing < angle_max)
    )
    binf = (bearing - angle_min) / (angle_max - angle_min) * n_bins
    bins = jnp.clip(binf.astype(jnp.int32), 0, n_bins - 1)
    near, far = _bin_min_max(
        rng.reshape(-1), ok.reshape(-1), bins.reshape(-1), n_bins, max_range
    )
    return Scan(
        ranges=near,
        far_ranges=jnp.where(jnp.isfinite(far), far, jnp.inf),
        angle_min=jnp.asarray(angle_min, jnp.float32),
        angle_max=jnp.asarray(angle_max, jnp.float32),
    )


def points_to_scan(
    points2d: jax.Array,
    valid: jax.Array,
    n_bins: int = 360,
    angle_min: float = -jnp.pi,
    angle_max: float = jnp.pi,
    max_range: float = 6.0,
    min_range: float = 0.05,
) -> Scan:
    """Re-bin 2-D points (in the scan frame) into a virtual scan: per
    bearing, nearest range (obstacle) + farthest (free-space evidence).
    Used to merge scans across frames: transform both point sets into the
    target frame, union, re-bin (the reference transforms + merges scans
    during node merging, ``graph_slam_node.cpp:890-1062``)."""
    x, y = points2d[..., 0], points2d[..., 1]
    rng = jnp.hypot(x, y)
    bearing = jnp.arctan2(y, x)
    ok = (
        valid & (rng >= min_range) & (rng <= max_range)
        & (bearing >= angle_min) & (bearing < angle_max)
    )
    binf = (bearing - angle_min) / (angle_max - angle_min) * n_bins
    bins = jnp.clip(binf.astype(jnp.int32), 0, n_bins - 1)
    near, far = _bin_min_max(
        rng.reshape(-1), ok.reshape(-1), bins.reshape(-1), n_bins, max_range
    )
    return Scan(
        ranges=near,
        far_ranges=jnp.where(jnp.isfinite(far), far, jnp.inf),
        angle_min=jnp.asarray(angle_min, jnp.float32),
        angle_max=jnp.asarray(angle_max, jnp.float32),
    )


def merge_scans(a: Scan, b: Scan, close_thresh: float = 0.2, prefer_b: bool = True) -> Scan:
    """Merge two scans over the same bearing grid (multi-camera fusion /
    revisit updates): average when ranges agree within ``close_thresh``,
    otherwise the preferred (newest) scan wins where it has data
    (reference polar merge ``graph_grid_mapper.cpp:45-133``)."""
    ra, rb = a.ranges, b.ranges
    both = jnp.isfinite(ra) & jnp.isfinite(rb)
    close = both & (jnp.abs(ra - rb) < close_thresh)
    pref = rb if prefer_b else ra
    other = ra if prefer_b else rb
    merged = jnp.where(
        close, 0.5 * (ra + rb), jnp.where(jnp.isfinite(pref), pref, other)
    )
    far = jnp.where(
        both, jnp.maximum(a.far_ranges, b.far_ranges),
        jnp.where(jnp.isfinite(rb), b.far_ranges, a.far_ranges),
    )
    return Scan(merged, far, a.angle_min, a.angle_max)


def scan_points(scan: Scan, use_far: bool = False) -> tuple[jax.Array, jax.Array]:
    """Scan -> 2-D points (B, 2) + validity in the scan frame."""
    r = scan.far_ranges if use_far else scan.ranges
    ang = scan.angles()
    ok = jnp.isfinite(r)
    rr = jnp.where(ok, r, 0.0)
    return jnp.stack([rr * jnp.cos(ang), rr * jnp.sin(ang)], axis=-1), ok


def scan_center(scan: Scan) -> jax.Array:
    """Mean of the valid scan points (reference ``scanMean``,
    ``graph_grid_mapper.cpp:605-621``), used as the scan anchor for
    distance gating. Returns (2,)."""
    pts, ok = scan_points(scan)
    w = ok.astype(jnp.float32)
    return jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
