"""Planar odometry EKF: wheel-odometry × IMU fusion upstream of SLAM.

Counterpart of the reference's ``robot_pose_ekf`` dependency (modified
navigation-stack EKF fusing wheel odometry and IMU,
``iti_slam_launch/launch/pose_ekf.launch:4-17``): the fused estimate is
what feeds the SLAM node's odometry callbacks.  State is planar
[x, y, yaw, v, omega]; wheel odometry measures (dx, dy, dyaw) in the body
frame, the IMU measures yaw rate (and absolute yaw if magnetometer-aided).
Pure functional scans — batches of sequences fuse under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


class EkfState(NamedTuple):
    x: jax.Array   # (5,) [x, y, yaw, v, omega]
    P: jax.Array   # (5, 5) covariance


def ekf_init(x0=None, p0: float = 1e-3) -> EkfState:
    x = jnp.zeros(5) if x0 is None else jnp.asarray(x0)
    return EkfState(x=x, P=p0 * jnp.eye(5))


def _wrap(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def ekf_predict(s: EkfState, dt: jax.Array, q_v: float = 0.5, q_w: float = 0.5) -> EkfState:
    """Constant-velocity unicycle prediction."""
    x, y, yaw, v, w = s.x
    nx = jnp.array([
        x + v * jnp.cos(yaw) * dt,
        y + v * jnp.sin(yaw) * dt,
        _wrap(yaw + w * dt),
        v,
        w,
    ])
    c, sn = jnp.cos(yaw), jnp.sin(yaw)
    F = jnp.eye(5)
    F = F.at[0, 2].set(-v * sn * dt).at[0, 3].set(c * dt)
    F = F.at[1, 2].set(v * c * dt).at[1, 3].set(sn * dt)
    F = F.at[2, 4].set(dt)
    Q = jnp.diag(jnp.array([1e-6, 1e-6, 1e-6, q_v * dt, q_w * dt]))
    return EkfState(x=nx, P=F @ s.P @ F.T + Q)


def ekf_update_odom(
    s: EkfState, body_delta: jax.Array, dt: jax.Array,
    sigma_trans: float = 0.02, sigma_rot: float = 0.01,
) -> EkfState:
    """Wheel-odometry measurement: body-frame (dx, dy, dyaw) over dt,
    interpreted as velocity measurements (v, omega) like the reference's
    odom topic."""
    dtc = jnp.maximum(dt, 1e-6)
    v_meas = body_delta[0] / dtc
    w_meas = body_delta[2] / dtc
    z = jnp.array([v_meas, w_meas])
    H = jnp.zeros((2, 5)).at[0, 3].set(1.0).at[1, 4].set(1.0)
    R = jnp.diag(jnp.array([(sigma_trans / dtc) ** 2, (sigma_rot / dtc) ** 2]))
    return _kalman_update(s, z, H, R)


def ekf_update_imu_yaw_rate(s: EkfState, yaw_rate: jax.Array, sigma: float = 0.005) -> EkfState:
    H = jnp.zeros((1, 5)).at[0, 4].set(1.0)
    return _kalman_update(s, jnp.array([yaw_rate]), H, jnp.array([[sigma**2]]))


def ekf_update_imu_yaw(s: EkfState, yaw: jax.Array, sigma: float = 0.02) -> EkfState:
    """Absolute-orientation update (magnetometer/gyro-integrated yaw)."""
    innov = _wrap(yaw - s.x[2])
    H = jnp.zeros((1, 5)).at[0, 2].set(1.0)
    S = H @ s.P @ H.T + jnp.array([[sigma**2]])
    K = s.P @ H.T @ jnp.linalg.inv(S)
    x = s.x + (K @ jnp.array([[innov]]))[:, 0]
    x = x.at[2].set(_wrap(x[2]))
    P = (jnp.eye(5) - K @ H) @ s.P
    return EkfState(x=x, P=P)


def _kalman_update(s: EkfState, z, H, R) -> EkfState:
    innov = z - H @ s.x
    S = H @ s.P @ H.T + R
    K = s.P @ H.T @ jnp.linalg.inv(S)
    x = s.x + K @ innov
    x = x.at[2].set(_wrap(x[2]))
    P = (jnp.eye(5) - K @ H) @ s.P
    return EkfState(x=x, P=P)


def ekf_pose(s: EkfState) -> jax.Array:
    """Current fused pose as SE(3) (planar), ready for the SLAM pipeline."""
    return lie.pose2_to_pose(s.x[:3])


def fuse_sequence(
    dts: jax.Array,
    odom_deltas: jax.Array,
    imu_yaw_rates: jax.Array,
    init: EkfState | None = None,
) -> jax.Array:
    """Fuse whole sequences in one scan: (T,) dts, (T, 3) body deltas,
    (T,) yaw rates -> (T, 7) fused SE(3) poses."""
    s0 = ekf_init() if init is None else init

    def step(s, inp):
        dt, od, wz = inp
        s = ekf_predict(s, dt)
        s = ekf_update_odom(s, od, dt)
        s = ekf_update_imu_yaw_rate(s, wz)
        return s, ekf_pose(s)

    _, poses = jax.lax.scan(step, s0, (dts, odom_deltas, imu_yaw_rates))
    return poses
