"""Dense colored-cloud registration: voxel downsample + 6-D (XYZ+Lab) ICP.

Re-design of the reference's ``CloudTransformationEstimator``
(``transformation_estimation/src/cloud_transformation_estimator.cpp``):
colored RGB-D clouds are reduced with a 5 cm voxel grid (``:117-129``) and
aligned with GICP6D — generalized ICP whose correspondence search runs in
a 6-D XYZ+CIELAB space so color disambiguates geometrically-ambiguous
matches (``external/gicp6d/gicp6d.{h,cpp}``, PointXYZLAB).  Acceptance
gates: correspondence fraction > 0.3 and correction ≤ 1 m / 30°
(``:66-70``); fixed information matrix (``:71-78``).

TPU-native shape: the voxel grid is a hash + segment-mean (static
capacity), correspondence search is one (M×M) distance reduction per
iteration, and the transform update is a weighted point-to-plane solve
with normals from batched 3×3 eigendecompositions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class GicpResult(NamedTuple):
    pose: jax.Array           # (7,) dst <- src
    fraction: jax.Array       # () matched-correspondence fraction
    mse: jax.Array            # ()
    information: jax.Array    # (6, 6) fixed model (reference :71-78)
    ok: jax.Array             # ()


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0,1] -> CIELAB (D65), as the reference's
    PointXYZLAB conversion."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = jnp.array([
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ])
    xyz = lin @ m.T
    white = jnp.array([0.95047, 1.0, 1.08883])
    t = xyz / white
    f = jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def voxel_downsample(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    voxel_size: float = 0.05,
    max_out: int = 1024,
):
    """Voxel-grid mean reduction with static output capacity.

    Returns (points (V, 3), colors (V, 3), valid (V,)).
    """
    q = jnp.floor(points / voxel_size).astype(jnp.int32)
    # spatial-hash voxel ids (classic large-prime mix; collisions merge two
    # far-apart voxels into one mean — vanishingly rare and harmless here)
    qq = (q + 32768).astype(jnp.uint32)
    ids = qq[:, 0] * jnp.uint32(73856093) ^ qq[:, 1] * jnp.uint32(19349663) ^ qq[:, 2] * jnp.uint32(83492791)
    ids = jnp.where(valid, ids, jnp.uint32(0xFFFFFFFF))

    uids = jnp.unique(ids, size=max_out, fill_value=jnp.uint32(0xFFFFFFFF))
    # map every point to its voxel slot
    slot = jnp.searchsorted(uids, ids)
    slot = jnp.clip(slot, 0, max_out - 1)
    hit = (uids[slot] == ids) & valid

    w = hit.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, slot, num_segments=max_out)
    psum = jax.ops.segment_sum(points * w[:, None], slot, num_segments=max_out)
    csum = jax.ops.segment_sum(colors * w[:, None], slot, num_segments=max_out)
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out_valid = (cnt > 0) & (uids != jnp.uint32(0xFFFFFFFF))
    return psum / denom, csum / denom, out_valid


def estimate_normals(points: jax.Array, valid: jax.Array, k: int = 8) -> jax.Array:
    """Per-point normals from k-NN PCA (batched 3x3 eigh)."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    neigh = points[idx]                       # (M, k, 3)
    wn = jnp.isfinite(-neg).astype(jnp.float32)
    mu = jnp.sum(neigh * wn[..., None], axis=1) / jnp.maximum(
        jnp.sum(wn, axis=1, keepdims=True), 1.0
    )
    c = (neigh - mu[:, None]) * wn[..., None]
    cov = jnp.einsum("mki,mkj->mij", c, c) + 1e-9 * jnp.eye(3)
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[:, :, 0]                      # smallest-eigenvalue direction


def gicp_6d(
    src_pts: jax.Array,
    src_lab: jax.Array,
    src_valid: jax.Array,
    dst_pts: jax.Array,
    dst_lab: jax.Array,
    dst_valid: jax.Array,
    init_pose: jax.Array | None = None,
    iterations: int = 20,
    max_corr_dist: float = 0.2,
    color_weight: float = 0.002,
    min_fraction: float = 0.3,
    max_correction: tuple[float, float] = (1.0, jnp.pi / 6),
) -> GicpResult:
    """Align src onto dst with color-augmented correspondences.

    ``color_weight`` scales Lab distance into metric units (PCL gicp6d's
    internal weighting); 20 iterations / 0.2 m correspondence radius are
    the reference parameters (``:144-153``).
    """
    pose0 = lie.pose_identity() if init_pose is None else init_pose
    normals = estimate_normals(dst_pts, dst_valid)

    def iteration(pose, _):
        moved = lie.pose_apply(pose[None], src_pts)
        d_geo = jnp.sum((moved[:, None] - dst_pts[None]) ** 2, axis=-1)
        d_col = jnp.sum((src_lab[:, None] - dst_lab[None]) ** 2, axis=-1)
        d6 = d_geo + color_weight * d_col
        d6 = jnp.where(dst_valid[None], d6, jnp.inf)
        j = jnp.argmin(d6, axis=-1)
        p = dst_pts[j]
        nrm = normals[j]
        geo = jnp.sum((moved - p) ** 2, axis=-1)
        w = (src_valid & (geo < max_corr_dist**2)).astype(jnp.float32)

        # point-to-plane Gauss-Newton step on se3
        r = jnp.sum((moved - p) * nrm, axis=-1)
        J_t = nrm                                          # d r / d translation
        J_r = jnp.cross(moved, nrm)                        # d r / d rotation
        J = jnp.concatenate([J_t, J_r], axis=-1)           # (M, 6)
        H = jnp.einsum("mi,mj,m->ij", J, J, w) + 1e-6 * jnp.eye(6)
        b = jnp.einsum("mi,m,m->i", J, r, w)
        dx = -jnp.linalg.solve(H, b)
        return lie.pose_compose(lie.se3_exp(dx), pose), None

    pose, _ = jax.lax.scan(iteration, pose0, None, length=iterations)

    moved = lie.pose_apply(pose[None], src_pts)
    d_geo = jnp.sum((moved[:, None] - dst_pts[None]) ** 2, axis=-1)
    d_geo = jnp.where(dst_valid[None], d_geo, jnp.inf)
    nn = jnp.min(d_geo, axis=-1)
    good = src_valid & (nn < max_corr_dist**2)
    n_src = jnp.maximum(jnp.sum(src_valid), 1)
    fraction = jnp.sum(good) / n_src
    mse = jnp.sum(jnp.where(good, nn, 0.0)) / jnp.maximum(jnp.sum(good), 1)

    corr = lie.pose_relative(pose0, pose)
    dt_c = jnp.linalg.norm(lie.pose_t(corr))
    dr_c = lie.rotation_angle(lie.pose_q(corr))
    ok = (
        (fraction > min_fraction)
        & (dt_c <= max_correction[0])
        & (dr_c <= max_correction[1])
        & jnp.all(jnp.isfinite(pose))
    )
    # fixed covariance model (reference :71-78): stiff, trusted when gated
    info = jnp.diag(jnp.array([100.0, 100.0, 100.0, 400.0, 400.0, 400.0]))
    return GicpResult(pose=pose, fraction=fraction, mse=mse, information=info, ok=ok)


def register_clouds(
    key_unused,
    src_pts, src_rgb, src_valid,
    dst_pts, dst_rgb, dst_valid,
    voxel_size: float = 0.05,
    max_voxels: int = 512,
    **gicp_kwargs,
) -> GicpResult:
    """Full dense pipeline: voxel grid both clouds, then 6-D ICP."""
    sp, sc, sv = voxel_downsample(src_pts, rgb_to_lab(src_rgb), src_valid, voxel_size, max_voxels)
    dp, dc, dv = voxel_downsample(dst_pts, rgb_to_lab(dst_rgb), dst_valid, voxel_size, max_voxels)
    return gicp_6d(sp, sc, sv, dp, dc, dv, **gicp_kwargs)
