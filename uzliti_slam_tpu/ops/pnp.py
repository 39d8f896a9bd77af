"""Batched RANSAC PnP: camera pose from 2D-3D correspondences.

Carries forward the reference's EPnP-variant feature estimator (the
unbuilt twin in ``graph_slam_common/src/transformation/
feature_transformation_estimator.cpp:136-144`` chooses EPnP + reprojection
consensus over SVD when 3-D is unavailable on one side; ``thirdparty/src/
epnp.cpp``).  TPU-native shape: K hypotheses of 6-point DLT solved as one
batched SVD, reprojection consensus as one (K × M) reduction, then a
Gauss-Newton polish on the inlier set — no sequential RANSAC loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class PnpResult(NamedTuple):
    pose: jax.Array        # (7,) camera-from-world: x_cam = T · X_world
    consensus: jax.Array   # () int32
    reproj_mse: jax.Array  # () px² mean over inliers
    ok: jax.Array


def _dlt_pose(X: jax.Array, xn: jax.Array, w: jax.Array) -> jax.Array:
    """6+-point DLT: solve M (3x4), x̂ ~ M X, from normalized image coords.

    X: (n, 3) world points; xn: (n, 2) normalized coords; w: (n,) weights.
    Returns pose (7,). Rotation re-orthogonalized via SVD.
    """
    n = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], axis=-1)      # (n, 4)
    zero = jnp.zeros((n, 4))
    r1 = jnp.concatenate([Xh, zero, -xn[:, 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zero, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2n, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    M = vt[-1].reshape(3, 4)
    # The DLT solution has an arbitrary sign (±λM project identically);
    # fold it into the WHOLE matrix via det(M[:,:3]) so the subsequent
    # orthonormalization lands on a proper rotation with a consistent t —
    # patching R and t separately produces reflections / mismatched pairs.
    det_raw = jnp.linalg.det(M[:, :3])
    M = M * jnp.where(det_raw < 0, -1.0, 1.0)
    u, s, vtr = jnp.linalg.svd(M[:, :3])
    R = u @ vtr                      # det=+1 since det(M[:,:3]) > 0
    scale = jnp.maximum(jnp.sum(s) / 3.0, 1e-12)
    t = M[:, 3] / scale
    # Hypotheses that put the scene behind the camera are killed by the
    # cheirality mask in consensus scoring — no ad-hoc flip here.
    return lie.make_pose(t, lie.matrix_to_quat(R))


def _project_norm(pose: jax.Array, X: jax.Array) -> jax.Array:
    pc = lie.pose_apply(pose[None], X)
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
    return pc[:, :2] / z[:, None]


def pnp_ransac(
    key: jax.Array,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    n_hypotheses: int = 64,
    reproj_thresh_px: float = 3.0,
    min_consensus: int = 15,
    refine_iters: int = 8,
) -> PnpResult:
    """Robust camera pose from M 2D-3D correspondences.

    X: (M, 3) points in the reference (world/candidate-node) frame;
    uv: (M, 2) pixel observations in the current camera.
    """
    m = X.shape[0]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)
    f_mean = 0.5 * (fx + fy)
    thresh_n = reproj_thresh_px / f_mean       # px -> normalized units

    # sample 6 DISTINCT indices among valid correspondences per hypothesis
    # (with-replacement draws give rank-deficient DLT systems ~40% of the
    # time at moderate m): random keys + top-k = uniform sampling without
    # replacement over the valid set
    scores = jax.random.uniform(key, (n_hypotheses, m))
    scores = jnp.where(valid[None, :], scores, -1e9)
    _, samples = jax.lax.top_k(scores, 6)

    def fit_one(idx6):
        w = valid[idx6].astype(jnp.float32)
        return _dlt_pose(X[idx6], xn[idx6], w)

    poses = jax.vmap(fit_one)(samples)
    proj = jax.vmap(lambda p: _project_norm(p, X))(poses)    # (K, M, 2)
    err2 = jnp.sum((proj - xn[None]) ** 2, axis=-1)
    front = jax.vmap(lambda p: lie.pose_apply(p[None], X)[:, 2] > 0.05)(poses)
    inl = (err2 < thresh_n**2) & valid[None] & front
    counts = jnp.sum(inl, axis=-1)
    sample_ok = valid[samples].all(axis=-1)
    counts = jnp.where(sample_ok, counts, -1)
    best = jnp.argmax(counts)
    pose = poses[best]
    best_inl = inl[best]

    # Gauss-Newton polish on the inlier reprojection error.
    def gn_step(p, _):
        def resid(dx):
            pp = lie.pose_retract(p, dx)
            return ((_project_norm(pp, X) - xn) * best_inl[:, None].astype(jnp.float32)).reshape(-1)

        r = resid(jnp.zeros(6))
        J = jax.jacfwd(resid)(jnp.zeros(6))
        H = J.T @ J + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(H, J.T @ r)
        return lie.pose_retract(p, dx), None

    pose, _ = jax.lax.scan(gn_step, pose, None, length=refine_iters)

    err2_f = jnp.sum((_project_norm(pose, X) - xn) ** 2, axis=-1)
    front_f = lie.pose_apply(pose[None], X)[:, 2] > 0.05
    inl_f = (err2_f < thresh_n**2) & valid & front_f
    consensus = jnp.sum(inl_f)
    mse_px = (
        jnp.sum(jnp.where(inl_f, err2_f, 0.0)) / jnp.maximum(consensus, 1)
    ) * f_mean**2
    ok = (consensus >= min_consensus) & jnp.all(jnp.isfinite(pose))
    return PnpResult(pose=pose, consensus=consensus.astype(jnp.int32),
                     reproj_mse=mse_px, ok=ok)
