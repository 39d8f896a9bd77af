"""Batched SE(3) relative-pose factors: residuals and Jacobians.

Replaces the reference's g2o ``EdgeSE3`` factors (added per-edge in
``graph_optimization/src/g2o_optimizer.cpp:261-299``) with one vmapped
residual/Jacobian evaluation over the whole edge table.  Jacobians are taken
with ``jax.jacfwd`` at the zero right-perturbation — exact, batched, and
fused by XLA into the solver step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


def edge_residual(pose_i: jax.Array, pose_j: jax.Array, meas: jax.Array) -> jax.Array:
    """r = log(T_meas^-1 · (X_i^-1 · X_j)) ∈ R^6."""
    pred = lie.pose_relative(pose_i, pose_j)
    return lie.se3_log(lie.pose_compose(lie.pose_inverse(meas), pred))


def _residual_perturbed(dx_i, dx_j, pose_i, pose_j, meas):
    return edge_residual(
        lie.pose_retract(pose_i, dx_i), lie.pose_retract(pose_j, dx_j), meas
    )


def edge_residual_jacobians_ad(pose_i, pose_j, meas):
    """jacfwd (12 forward passes) reference implementation — kept as the
    oracle the analytic form is validated against in tests."""
    zero = jnp.zeros((6,), dtype=pose_i.dtype)
    r = edge_residual(pose_i, pose_j, meas)
    Ji = jax.jacfwd(_residual_perturbed, argnums=0)(zero, zero, pose_i, pose_j, meas)
    Jj = jax.jacfwd(_residual_perturbed, argnums=1)(zero, zero, pose_i, pose_j, meas)
    return r, Ji, Jj


def edge_residual_jacobians(pose_i, pose_j, meas):
    """Residual plus analytic 6x6 Jacobians wrt right-perturbations.

    For r = log(M⁻¹·A) with A = Xᵢ⁻¹Xⱼ:
      Xⱼ → Xⱼ·exp(ξ):  A·exp(ξ)          ⇒  Jⱼ =  Jr⁻¹(r)
      Xᵢ → Xᵢ·exp(ξ):  exp(-ξ) pre-A ⇒ A·exp(-Ad_{A⁻¹}ξ)
                                          ⇒  Jᵢ = -Jr⁻¹(r)·Ad_{A⁻¹}
    Closed forms (so3 Jacobian inverse + Barfoot Q) replace the 12
    forward-mode passes of the jacfwd version — ~5x cheaper per edge,
    which is the dominant linearization cost at 100k nodes."""
    pred = lie.pose_relative(pose_i, pose_j)
    r = lie.se3_log(lie.pose_compose(lie.pose_inverse(meas), pred))
    Jj = lie.se3_right_jacobian_inv(r)
    Ji = -(Jj @ lie.se3_adjoint(lie.pose_inverse(pred)))
    return r, Ji, Jj


def jacobians_from_residual(r: jax.Array, adj_meas_inv: jax.Array):
    """Jacobians from the residual twist alone (batched, (E, 6...)).

    Since pred = meas·exp(r), Ad_{pred⁻¹} = Ad_{exp(-r)}·Ad_{meas⁻¹}; with
    Ad_{meas⁻¹} precomputed once per solve (measurements are constant),
    the per-iteration linearization needs NO pose gathers at all — the LM
    loop carries ``r`` forward from the accepted candidate's χ² evaluation.
    """
    Jj = lie.se3_right_jacobian_inv(r)
    adj = lie.se3_adjoint(lie.se3_exp(-r))
    Ji = -(Jj @ (adj @ adj_meas_inv))
    return Ji, Jj


# Batched over the edge table.
batched_residuals = jax.vmap(edge_residual)
batched_residual_jacobians = jax.vmap(edge_residual_jacobians)
batched_residual_jacobians_ad = jax.vmap(edge_residual_jacobians_ad)


def huber_weight(chi2: jax.Array, delta: float = 1.0) -> jax.Array:
    """Huber robust reweighting on the Mahalanobis norm.

    Matches g2o's RobustKernelHuber applied per edge in the reference
    (``g2o_optimizer.cpp:292-294``, delta = 1): weight 1 inside the
    quadratic region, delta/||r|| outside.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


def edge_chi2(r: jax.Array, info: jax.Array) -> jax.Array:
    """chi2 = r^T Λ r per edge (batched)."""
    return jnp.einsum("...i,...ij,...j->...", r, info, r)
