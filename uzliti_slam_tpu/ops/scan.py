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
    bins_flat = bins.reshape(-1)
    ok_flat = ok.reshape(-1)
    rng_flat = rng.reshape(-1)

    near = jax.ops.segment_min(
        jnp.where(ok_flat, rng_flat, jnp.inf), bins_flat, num_segments=n_bins
    )
    far = jax.ops.segment_max(
        jnp.where(ok_flat, rng_flat, -jnp.inf), bins_flat, num_segments=n_bins
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
    **kwargs,
) -> Scan:
    """Depth image -> virtual scan. ``cam_pose`` maps camera frame to robot
    base frame (sensor extrinsic, applied before the height-band filter)."""
    from uzliti_slam_tpu.frontend import camera as cam_mod

    cloud = cam_mod.backproject_image(cam, depth)
    valid = (depth > 0.01) & jnp.isfinite(depth)
    base = lie.pose_apply(cam_pose[None, None], cloud)
    return cloud_to_scan(base, valid, n_bins=n_bins, **kwargs)


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
