"""Sensor-extrinsic + odometry calibration solver.

Re-design of the reference's offline ``SensorTransformOptimizer``
(``graph_optimization/src/sensor_transform_optimizer.cpp:37-192``): node
poses are held fixed; the variables are per-sensor SE(3) extrinsics (with a
prior to their initial values, ``:53-66``) and a global odometry drift
parameter vector (``VertexOdomParams``, ``:71-74``).

Factor models:

- Sensor edges (``EdgeSE3SensorCalib``, ``edge_se3_sensor_calib.h:38-54``):
  r = log( T_e⁻¹ · (X_i·L_{s_i})⁻¹ · (X_j·L_{s_j}) )
- Odometry edges (``EdgeSE3OdomDifferentialCalib``,
  ``edge_se3_odom_differential_calib.cpp:31-65``): the measurement is
  warped by params (p0 = translation scale, p1 = yaw drift per rad,
  p2 = yaw drift per meter):
      drift = p1·|yaw| + p2·‖t‖
      t'    = p0 · Rz(drift) · t,   yaw' = yaw + drift
  r = log( (X_i⁻¹X_j)⁻¹ · warp(T_e, p) )

The parameter space is tiny (6·S + 3), so one dense Gauss-Newton with
jacfwd Jacobians over the whole residual stack is exact and cheap — no
need for the reference's 100 LM iterations of sparse machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


class CalibrationResult(NamedTuple):
    sensor_transforms: jax.Array  # (S, 7) calibrated extrinsics
    odom_params: jax.Array        # (3,) [trans_scale, yaw_per_rad, yaw_per_m]
    final_cost: jax.Array
    cost_history: jax.Array


def odometry_drift_correct(meas: jax.Array, params: jax.Array) -> jax.Array:
    """Apply the drift model to an odometry measurement pose (..., 7)."""
    t = lie.pose_t(meas)
    yaw = lie.yaw_of(lie.pose_q(meas))
    drift = params[1] * jnp.abs(yaw) + params[2] * jnp.linalg.norm(t, axis=-1)
    c, s = jnp.cos(drift), jnp.sin(drift)
    t_new = params[0] * jnp.stack(
        [c * t[..., 0] - s * t[..., 1], s * t[..., 0] + c * t[..., 1], t[..., 2]],
        axis=-1,
    )
    dq = jnp.stack(
        [jnp.cos(drift / 2), jnp.zeros_like(drift), jnp.zeros_like(drift), jnp.sin(drift / 2)],
        axis=-1,
    )
    q_new = lie.quat_normalize(lie.quat_mul(dq, lie.pose_q(meas)))
    return jnp.concatenate([t_new, q_new], axis=-1)


def calibrate(
    g: GraphState,
    initial_sensor_transforms: jax.Array,   # (S, 7)
    e_sensor_from: jax.Array,               # (E,) int32 sensor idx, -1 = base
    e_sensor_to: jax.Array,                 # (E,) int32
    iterations: int = 20,
    prior_weight: float = 1e2,
    damping: float = 1e-6,
) -> CalibrationResult:
    """Solve for sensor extrinsics + odometry params on a frozen graph."""
    s_count = initial_sensor_transforms.shape[0]
    is_odom = (g.e_type == gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY) & g.e_valid
    is_sensor = (
        (g.e_type == gstate.EDGE_TYPE_3D_FULL) & g.e_valid & (e_sensor_from >= 0)
    )

    Xi = g.pose[g.e_from]
    Xj = g.pose[g.e_to]
    sf = jnp.maximum(e_sensor_from, 0)
    st = jnp.maximum(e_sensor_to, 0)

    def unpack(theta):
        dl = theta[: 6 * s_count].reshape(s_count, 6)
        L = lie.pose_retract(initial_sensor_transforms, dl)
        p = theta[6 * s_count:]
        return L, p

    def residuals(theta):
        L, p = unpack(theta)
        # sensor factors
        li = L[sf]
        lj = L[st]
        pred = lie.pose_relative(lie.pose_compose(Xi, li), lie.pose_compose(Xj, lj))
        r_sens = lie.se3_log(
            lie.pose_compose(lie.pose_inverse(g.e_transform), pred)
        ) * is_sensor[:, None]
        # odometry factors
        warped = odometry_drift_correct(g.e_transform, p)
        r_odo = lie.se3_log(
            lie.pose_compose(lie.pose_inverse(lie.pose_relative(Xi, Xj)), warped)
        ) * is_odom[:, None]
        # priors: keep extrinsics near initial (reference SE3 prior edges)
        r_prior = jnp.sqrt(prior_weight) * theta[: 6 * s_count]
        # weak prior pulling odom params to nominal [1, 0, 0]
        r_p = 1e-2 * (p - jnp.array([1.0, 0.0, 0.0]))
        return jnp.concatenate(
            [r_sens.reshape(-1), r_odo.reshape(-1), r_prior, r_p]
        )

    def cost(theta):
        r = residuals(theta)
        return 0.5 * jnp.sum(r * r)

    theta0 = jnp.concatenate([jnp.zeros(6 * s_count), jnp.array([1.0, 0.0, 0.0])])

    def gn_step(theta, _):
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J + damping * jnp.eye(theta.shape[0])
        gvec = J.T @ r
        theta = theta - jnp.linalg.solve(H, gvec)
        return theta, cost(theta)

    theta, hist = jax.lax.scan(gn_step, theta0, None, length=iterations)
    L, p = unpack(theta)
    return CalibrationResult(
        sensor_transforms=L,
        odom_params=p,
        final_cost=hist[-1],
        cost_history=jnp.concatenate([cost(theta0)[None], hist]),
    )
