"""Batched PROSAC/RANSAC rigid-transform estimation.

Replaces the reference's sequential per-pair PROSAC loop
(``transformation_estimation/src/feature_transformation_estimator.cpp:
186-347``: ≤100 iterations of progressively-widened 3-point sampling +
weighted-SVD + 3-D inlier consensus + refit) with a fully batched program:
K hypotheses sampled at once, K Kabsch solves vmapped over the batch, one
(K × M) consensus reduction, masked refit on the winning inlier set.  The
whole estimator then vmaps again over thousands of candidate node pairs —
the reference's worker-thread queue (``transformation_estimator.cpp:45-62``)
turned into data parallelism.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class RansacResult(NamedTuple):
    pose: jax.Array        # (7,) estimated rigid transform dst <- src
    consensus: jax.Array   # () int32 inlier count
    mse: jax.Array         # () mean squared inlier error
    information: jax.Array  # (6, 6) edge information matrix
    ok: jax.Array          # () bool — consensus/valid gates passed


def kabsch(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted rigid alignment: pose p with dst ≈ p·src.

    Weighted-SVD equivalent of PCL's ``TransformationFromCorrespondences``
    used by the reference for its 3-point model (reference ``:299-314``).
    src, dst: (M, 3); weights: (M,) ≥ 0.
    """
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    cs = src - mu_s
    cd = dst - mu_d
    cov = (cd * w[:, None]).T @ cs / wsum
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = u @ D @ vt
    t = mu_d - R @ mu_s
    return lie.make_pose(t, lie.matrix_to_quat(R))


def kabsch_quat(src: jax.Array, dst: jax.Array, weights: jax.Array,
                iters: int = 30) -> jax.Array:
    """Horn's quaternion absolute-orientation solve: same optimum as
    :func:`kabsch` but via the max eigenvector of the 4×4 profile matrix,
    found by shifted power iteration — pure elementwise VPU math with no
    SVD custom call, so thousands of RANSAC hypothesis fits batch freely
    (measured: the 3×3 SVD dominated the cluster filter's runtime).

    Used for HYPOTHESIS fits only: with a tiny eigengap (degenerate
    3-point samples) power iteration can lag, which consensus tolerates;
    refits keep the SVD path for full accuracy.
    """
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    cs = src - mu_s
    cd = dst - mu_d
    S = (cs * w[:, None]).T @ cd / wsum  # S_ab = Σ w·cs_a·cd_b
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
    ])
    c = jnp.linalg.norm(N) + 1e-6  # Frobenius shift makes λ_max dominant
    A = N + c * jnp.eye(4)
    q = jnp.ones(4) * 0.5

    def body(_, q):
        q = A @ q
        return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)

    q = jax.lax.fori_loop(0, iters, body, q)
    R = lie.quat_to_matrix(q)
    t = mu_d - R @ mu_s
    return lie.make_pose(t, q)


def _valid_sample(key: jax.Array, k_hyp: int, valid: jax.Array,
                  quality: jax.Array | None = None, beta: float = 4.0):
    """Sample (k_hyp, 3) correspondence indices among VALID entries only.

    Quality-biased categorical sampling is the batched analog of PROSAC's
    progressively-widened quality window (reference
    ``feature_transformation_estimator.cpp:214-243``) that works for
    arbitrary validity masks — uniform windowed sampling would almost
    never draw 3 valid points from a sparse mask (e.g. a small cluster
    scattered through a large candidate table). With ``quality`` given,
    high-quality correspondences are exponentially preferred (soft
    PROSAC); without it, sampling is uniform over the valid set.
    """
    # -1e30 instead of -inf: an all-invalid mask must still sample finite
    # indices (results are discarded via the sample-validity gate)
    if quality is None:
        logits = jnp.where(valid, 0.0, -1e30)
    else:
        q = jnp.where(valid, quality, -jnp.inf)
        # normalize to [0, 1] rank-free scale before tempering
        qmax = jnp.max(jnp.where(valid, quality, -jnp.inf))
        qmin = jnp.min(jnp.where(valid, quality, jnp.inf))
        span = jnp.maximum(qmax - qmin, 1e-6)
        logits = jnp.where(valid, beta * (q - qmin) / span, -1e30)
    return jax.random.categorical(key, logits[None, None, :], shape=(k_hyp, 3))


def ransac_rigid(
    key: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    valid: jax.Array,
    n_hypotheses: int = 128,
    inlier_thresh: float = 0.05,
    min_consensus: int = 12,
    weights: jax.Array | None = None,
    quality: jax.Array | None = None,
    min_sigma: float = 0.01,
) -> RansacResult:
    """Batched robust rigid-transform fit between corresponded 3-D points.

    src, dst: (M, 3) corresponded points; valid: (M,) bool (may be
    arbitrarily sparse — sampling is restricted to valid entries).
    ``quality`` optionally biases sampling toward better matches (soft
    PROSAC). Everything static-shaped: K hypotheses evaluated
    unconditionally (no early exit; the reference's 60%-inlier break,
    ``FeatureLinkEstimation.cfg:11-12``, is subsumed by evaluating all
    hypotheses at once).
    """
    m = src.shape[0]
    w = valid.astype(jnp.float32) if weights is None else weights * valid

    tri = _valid_sample(key, n_hypotheses, valid, quality)  # (K, 3)

    def fit_one(idx3):
        s = src[idx3]
        d = dst[idx3]
        wt = w[idx3]
        # Horn instead of SVD: K hypothesis fits per candidate batch freely
        # on the VPU; the refit below keeps the SVD path
        return kabsch_quat(s, d, wt)

    hyp_poses = jax.vmap(fit_one)(tri)  # (K, 7)

    # Consensus: residuals of ALL correspondences under each hypothesis.
    pred = jax.vmap(lambda p: lie.pose_apply(p, src))(hyp_poses)  # (K, M, 3)
    err2 = jnp.sum((pred - dst[None]) ** 2, axis=-1)  # (K, M)
    inl = (err2 < inlier_thresh**2) & valid[None]
    counts = jnp.sum(inl, axis=-1)

    # Degenerate-sample guard: samples with repeated indices give rank<2.
    distinct = (
        (tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2]) & (tri[:, 0] != tri[:, 2])
    )
    sample_valid = valid[tri].all(axis=-1) & distinct
    counts = jnp.where(sample_valid, counts, -1)

    best = jnp.argmax(counts)
    best_inl = inl[best]

    # Refit on the max-consensus set (reference ``:246-290``), then recompute
    # inliers/MSE under the refit model.
    refit = kabsch(src, dst, best_inl.astype(jnp.float32) * w)
    err2_refit = jnp.sum((lie.pose_apply(refit, src) - dst) ** 2, axis=-1)
    inl_refit = (err2_refit < inlier_thresh**2) & valid
    consensus = jnp.sum(inl_refit)
    mse = jnp.sum(err2_refit * inl_refit) / jnp.maximum(consensus, 1)

    # Information model: 0.1·consensus/mse, rotation block ×100
    # (``feature_transformation_estimator.cpp:133-136``). The mse is
    # floored at min_sigma² — a sensor noise floor. On near-noiseless
    # (quantized) data the raw formula yields ~1e8 information, which (a)
    # overstates certainty the sensor does not have and (b) pushes the
    # Hessian's condition number beyond what any fixed CG budget solves.
    base = 0.1 * consensus.astype(jnp.float32) / jnp.maximum(mse, min_sigma**2)
    diag = jnp.concatenate([jnp.full((3,), base), jnp.full((3,), base * 100.0)])
    information = jnp.diag(diag)

    ok = (consensus >= min_consensus) & (counts[best] > 0)
    return RansacResult(
        pose=refit,
        consensus=consensus.astype(jnp.int32),
        mse=mse,
        information=information,
        ok=ok,
    )


# Vmapped over B candidate pairs: keys (B,2), src/dst (B, M, 3), valid (B, M).
ransac_rigid_batch = jax.vmap(
    ransac_rigid, in_axes=(0, 0, 0, 0, None, None, None)
)
