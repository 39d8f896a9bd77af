"""Batched planar point-to-line ICP (scan matching).

Replaces the reference's CSM ``sm_icp`` call
(``transformation_estimation/src/laser_transformation_estimator.cpp:331``,
point-to-line metric, ~30 tuned params, not thread-safe → global mutex)
with a fixed-iteration, fully-batched matcher: correspondence search is an
(M×M) distance matmul, the 3-DoF update is a closed-form 3×3 normal-equation
solve, and the whole matcher vmaps over thousands of scan pairs.

Covariance follows Censi's "accurate covariance estimation" shape the
reference relies on (``:357-376``): cov ∝ (JᵀJ)⁻¹ of the point-to-line
residuals, rescaled to a fixed information budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class IcpResult(NamedTuple):
    pose2: jax.Array        # (3,) [x, y, theta] dst <- src
    valid_fraction: jax.Array  # () fraction of src points with a valid match
    mse: jax.Array          # () mean squared point-to-line residual
    cov3: jax.Array         # (3, 3) Censi-style covariance over (x, y, theta)
    ok: jax.Array           # () bool — gates passed


def _se2_apply(p: jax.Array, pts: jax.Array) -> jax.Array:
    c, s = jnp.cos(p[2]), jnp.sin(p[2])
    x = c * pts[..., 0] - s * pts[..., 1] + p[0]
    y = s * pts[..., 0] + c * pts[..., 1] + p[1]
    return jnp.stack([x, y], axis=-1)


def _correspondences(pose, src, src_valid, dst, dst_valid, max_corr_dist):
    """Point-to-line correspondences under ``pose``: returns (moved, normal,
    signed line distance r, weight). A correspondence needs TWO valid dst
    points (the line endpoints) within range — a line through a padded
    invalid point would have an arbitrary normal."""
    moved = _se2_apply(pose, src)                       # (M, 2)
    d2 = jnp.sum((moved[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(dst_valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 2)
    p1 = dst[idx[:, 0]]
    p2 = dst[idx[:, 1]]
    seg = p2 - p1
    seg_len = jnp.maximum(jnp.linalg.norm(seg, axis=-1), 1e-9)
    normal = jnp.stack([-seg[:, 1], seg[:, 0]], axis=-1) / seg_len[:, None]
    r = jnp.sum((moved - p1) * normal, axis=-1)
    w = (
        src_valid
        & (-neg[:, 0] < max_corr_dist**2)
        & jnp.isfinite(-neg[:, 0])
        & jnp.isfinite(-neg[:, 1])
    ).astype(jnp.float32)
    return moved, normal, r, w


def icp_point_to_line(
    src: jax.Array,
    src_valid: jax.Array,
    dst: jax.Array,
    dst_valid: jax.Array,
    init: jax.Array,
    iterations: int = 20,
    max_corr_dist: float = 0.5,
    min_valid_fraction: float = 0.25,
    max_correction: tuple[float, float] = (1.5, 0.8),
    sigma: float = 0.02,
) -> IcpResult:
    """Align ``src`` (M, 2) onto ``dst`` (N, 2) starting from ``init``
    [x, y, theta].

    Gates mirror the reference: ≥25 % valid correspondences
    (``laser_transformation_estimator.cpp:383-386``) and total correction
    bounded (``:162-167``).
    """
    def iteration(pose, _):
        moved, normal, r, w = _correspondences(
            pose, src, src_valid, dst, dst_valid, max_corr_dist
        )
        # J_i = [n_x, n_y, n · d(moved)/dθ]
        dth = jnp.stack([-moved[:, 1] + pose[1], moved[:, 0] - pose[0]], axis=-1)
        J = jnp.concatenate([normal, jnp.sum(normal * dth, axis=-1, keepdims=True)], axis=-1)
        H = jnp.einsum("mi,mj,m->ij", J, J, w) + 1e-9 * jnp.eye(3)
        b = jnp.einsum("mi,m,m->i", J, r, w)
        delta = -jnp.linalg.solve(H, b)
        new_pose = jnp.array([pose[0] + delta[0], pose[1] + delta[1], pose[2] + delta[2]])
        return new_pose, None

    pose, _ = jax.lax.scan(iteration, init, None, length=iterations)

    # final correspondence audit (reference recount, ``:180-207``)
    moved, normal, r, nw = _correspondences(
        pose, src, src_valid, dst, dst_valid, max_corr_dist
    )
    n_good = jnp.sum(nw)
    n_src = jnp.maximum(jnp.sum(src_valid), 1)
    valid_fraction = n_good / n_src
    mse = jnp.sum(r * r * nw) / jnp.maximum(n_good, 1.0)

    # Censi-style covariance: sigma^2 (J^T J)^-1 on the final linearization.
    dth = jnp.stack([-moved[:, 1] + pose[1], moved[:, 0] - pose[0]], axis=-1)
    J = jnp.concatenate([normal, jnp.sum(normal * dth, axis=-1, keepdims=True)], axis=-1)
    H = jnp.einsum("mi,mj,m->ij", J, J, nw) + 1e-6 * jnp.eye(3)
    cov3 = sigma**2 * jnp.linalg.inv(H)

    corr = pose - init
    correction_ok = (
        (jnp.abs(corr[0]) < max_correction[0])
        & (jnp.abs(corr[1]) < max_correction[0])
        & (jnp.abs(corr[2]) < max_correction[1])
    )
    ok = (valid_fraction >= min_valid_fraction) & correction_ok & jnp.all(jnp.isfinite(pose))
    return IcpResult(pose2=pose, valid_fraction=valid_fraction, mse=mse, cov3=cov3, ok=ok)


icp_batch = jax.vmap(
    icp_point_to_line, in_axes=(0, 0, 0, 0, 0, None, None, None, None, None)
)


def icp_information_6d(cov3: jax.Array, target_trace: float = 1e4) -> jax.Array:
    """Map the (x, y, theta) covariance to a 6×6 information matrix with the
    reference's normalization: information rescaled so its trace is
    ``target_trace``, placed into x, y, yaw of the 6-DoF edge
    (``laser_transformation_estimator.cpp:357-376``)."""
    info3 = jnp.linalg.inv(cov3 + 1e-12 * jnp.eye(3))
    info3 = info3 * (target_trace / jnp.maximum(jnp.trace(info3), 1e-12))
    out = jnp.zeros((6, 6))
    out = out.at[0, 0].set(info3[0, 0]).at[0, 1].set(info3[0, 1]).at[1, 0].set(info3[1, 0])
    out = out.at[1, 1].set(info3[1, 1])
    out = out.at[0, 5].set(info3[0, 2]).at[5, 0].set(info3[2, 0])
    out = out.at[1, 5].set(info3[1, 2]).at[5, 1].set(info3[2, 1])
    out = out.at[5, 5].set(info3[2, 2])
    return out


def icp_edge_pose(pose2: jax.Array) -> jax.Array:
    """ICP SE2 result -> SE3 edge transform (planar)."""
    return lie.pose2_to_pose(pose2)
