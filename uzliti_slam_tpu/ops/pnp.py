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


def _homography_pose(X: jax.Array, xn: jax.Array, w: jax.Array) -> jax.Array:
    """Planar pose recovery: fit the sample's plane, DLT a homography from
    plane coordinates to normalized image coordinates, decompose into
    (R, t) — the planar configuration where the 6-point DLT is degenerate
    (EPnP's planar N=3 control-point case; indoor walls/floors hit this
    constantly). Cheirality fixed by positive centroid depth; improper
    samples are killed by consensus scoring downstream."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    c0 = jnp.sum(X * w[:, None], axis=0) / wsum
    Xc = (X - c0) * w[:, None]
    _, _, vt = jnp.linalg.svd(Xc, full_matrices=False)
    e1, e2 = vt[0], vt[1]
    px = (X - c0) @ e1
    py = (X - c0) @ e2
    x, y = xn[:, 0], xn[:, 1]
    z0 = jnp.zeros_like(px)
    o = jnp.ones_like(px)
    r1 = jnp.stack([px, py, o, z0, z0, z0, -x * px, -x * py, -x], axis=-1)
    r2 = jnp.stack([z0, z0, z0, px, py, o, -y * px, -y * py, -y], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vh = jnp.linalg.svd(A, full_matrices=True)
    H = vh[-1].reshape(3, 3)
    s = jnp.sqrt(
        jnp.linalg.norm(H[:, 0]) * jnp.linalg.norm(H[:, 1])
    ) + 1e-12
    # centroid (plane coords (0,0)) must sit in front: t_z = σ·H[2,2]/s > 0
    sigma = jnp.where(H[2, 2] > 0, 1.0, -1.0)
    Hs = sigma * H / s
    r1c = Hs[:, 0] / (jnp.linalg.norm(Hs[:, 0]) + 1e-12)
    r2o = Hs[:, 1] - r1c * jnp.dot(r1c, Hs[:, 1])
    r2c = r2o / (jnp.linalg.norm(r2o) + 1e-12)
    r3c = jnp.cross(r1c, r2c)
    Rp = jnp.stack([r1c, r2c, r3c], axis=-1)   # plane frame -> camera
    t = Hs[:, 2]
    npl = jnp.cross(e1, e2)
    # complete the world->camera rotation: on-plane offsets map through
    # (e1, e2), the normal through the third column (contributes zero for
    # points exactly on the plane)
    Rc = Rp[:, :2] @ jnp.stack([e1, e2]) + Rp[:, 2:3] @ npl[None]
    tc = t - Rc @ c0
    return lie.make_pose(tc, lie.matrix_to_quat(Rc))


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
    depth: jax.Array | None = None,
    depth_tol: float = 0.04,
) -> PnpResult:
    """Robust camera pose from M 2D-3D correspondences.

    X: (M, 3) points in the reference (world/candidate-node) frame;
    uv: (M, 2) pixel observations in the current camera.

    ``depth``: optional (M,) measured camera-frame depth of each
    observation (<=0 = unknown). Planar scenes admit a two-fold pose
    ambiguity that reprojection alone cannot break under weak perspective
    (the IPPE ambiguity); where depth is measured, an inlier must also
    agree with it to within ``depth_tol`` (relative). Observations
    without depth participate exactly as before.
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

    def fit_one_planar(idx6):
        w = valid[idx6].astype(jnp.float32)
        return _homography_pose(X[idx6], xn[idx6], w)

    # Each sample yields hypotheses from complementary solvers, consensus
    # picks whichever fits (the reference chooses EPnP vs SVD by 3-D
    # availability, feature_transformation_estimator.cpp:136-144):
    # - general 6-point DLT (degenerate for coplanar samples),
    # - planar homography decomposition (exact on a single wall, but
    #   carries the weak-perspective two-fold ambiguity),
    # - when measured depth exists: rigid Kabsch against the
    #   back-projected observations — exact and ambiguity-free.
    fams = [jax.vmap(fit_one)(samples), jax.vmap(fit_one_planar)(samples)]
    n_fam = 2
    if depth is not None:
        from uzliti_slam_tpu.ops.ransac import kabsch

        X_cam = jnp.concatenate([xn * depth[:, None], depth[:, None]], axis=-1)

        def fit_one_rigid(idx6):
            w = (valid[idx6] & (depth[idx6] > 0.05)).astype(jnp.float32)
            return kabsch(X[idx6], X_cam[idx6], w)

        fams.append(jax.vmap(fit_one_rigid)(samples))
        n_fam = 3
    poses = jnp.concatenate(fams)
    samples = jnp.concatenate([samples] * n_fam)
    pc = jax.vmap(lambda p: lie.pose_apply(p[None], X))(poses)  # (K, M, 3)
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    proj = pc[..., :2] / z[..., None]
    err2 = jnp.sum((proj - xn[None]) ** 2, axis=-1)
    front = pc[..., 2] > 0.05
    if depth is not None:
        has_d = depth > 0.05
        d_ok = ~has_d[None] | (
            jnp.abs(pc[..., 2] - depth[None])
            < depth_tol * jnp.maximum(depth[None], 1.0)
        )
    else:
        d_ok = jnp.ones_like(front)
    inl = (err2 < thresh_n**2) & valid[None] & front & d_ok
    counts = jnp.sum(inl, axis=-1)
    sample_ok = valid[samples].all(axis=-1)
    counts = jnp.where(sample_ok, counts, -1)
    best = jnp.argmax(counts)
    pose = poses[best]
    best_inl = inl[best]

    # Gauss-Newton polish on the inlier reprojection error (+ measured
    # depth rows where available — keeps the refined pose metrically
    # anchored, not just ray-consistent).
    if depth is not None:
        d_w = (best_inl & (depth > 0.05)).astype(jnp.float32)
    else:
        d_w = jnp.zeros(m)

    def gn_step(p, _):
        def resid(dx):
            pp = lie.pose_retract(p, dx)
            rp = ((_project_norm(pp, X) - xn) * best_inl[:, None].astype(jnp.float32)).reshape(-1)
            if depth is None:
                return rp
            zp = lie.pose_apply(pp[None], X)[:, 2]
            rz = (zp - depth) / jnp.maximum(depth, 1.0) * d_w
            return jnp.concatenate([rp, rz])

        r = resid(jnp.zeros(6))
        J = jax.jacfwd(resid)(jnp.zeros(6))
        H = J.T @ J + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(H, J.T @ r)
        return lie.pose_retract(p, dx), None

    pose, _ = jax.lax.scan(gn_step, pose, None, length=refine_iters)

    pc_f = lie.pose_apply(pose[None], X)
    err2_f = jnp.sum((_project_norm(pose, X) - xn) ** 2, axis=-1)
    front_f = pc_f[:, 2] > 0.05
    if depth is not None:
        d_ok_f = ~(depth > 0.05) | (
            jnp.abs(pc_f[:, 2] - depth)
            < depth_tol * jnp.maximum(depth, 1.0)
        )
    else:
        d_ok_f = jnp.ones_like(front_f)
    inl_f = (err2_f < thresh_n**2) & valid & front_f & d_ok_f
    consensus = jnp.sum(inl_f)
    mse_px = (
        jnp.sum(jnp.where(inl_f, err2_f, 0.0)) / jnp.maximum(consensus, 1)
    ) * f_mean**2
    ok = (consensus >= min_consensus) & jnp.all(jnp.isfinite(pose))
    return PnpResult(pose=pose, consensus=consensus.astype(jnp.int32),
                     reproj_mse=mse_px, ok=ok)
