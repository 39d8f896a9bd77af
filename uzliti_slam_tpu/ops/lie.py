"""SE(3)/SO(3) Lie-group operations on batched arrays.

Pose representation: ``(..., 7)`` float arrays laid out as
``[tx, ty, tz, qw, qx, qy, qz]`` (translation then unit quaternion, scalar
first).  Tangent (twist) representation: ``(..., 6)`` arrays laid out as
``[vx, vy, vz, wx, wy, wz]`` (translation part first, rotation part second).

This is the TPU-native replacement for the g2o ``internal::`` pose algebra
the reference leans on everywhere (e.g. reference
``graph_optimization/src/g2o_optimizer.cpp:165-168`` uses
``toVectorMQT`` / Isometry3D maps; here every op is batched, differentiable
and jit-safe).  All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle cutoff for Taylor fallbacks. f32-safe.
_EPS = 1e-6


def _safe_norm(v: jax.Array, axis: int = -1) -> jax.Array:
    """Norm that is NaN-free to differentiate at 0."""
    sq = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, 1e-30))


# ---------------------------------------------------------------------------
# Quaternions (scalar-first [w, x, y, z])
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = _safe_norm(q)[..., None]
    q = q / n
    # Canonicalize sign (w >= 0) so pose comparisons are stable.
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:4]
    qw = q[..., 0:1]
    # v' = v + 2*qw*(qv x v) + 2*qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), scalar first.

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the best-conditioned one (largest pivot) with where-masks, so it
    vmaps and differentiates cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_pivot^2 (guaranteed >= 0 pre-max).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None], axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_axis_angle(phi: jax.Array) -> jax.Array:
    """so(3) vector (..., 3) -> quaternion via exp."""
    theta = _safe_norm(phi)
    half = 0.5 * theta
    small = theta < _EPS
    # sin(t/2)/t with Taylor fallback 0.5 - t^2/48
    k = jnp.where(small, 0.5 - theta * theta / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    w = jnp.cos(half)
    return quat_normalize(jnp.concatenate([w[..., None], k[..., None] * phi], axis=-1))


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """Quaternion -> so(3) vector (log map)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:4]
    vn = _safe_norm(v)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < _EPS
    scale = jnp.where(small, 2.0 / jnp.where(jnp.abs(w) < 1e-12, 1.0, w), theta / jnp.where(small, 1.0, vn))
    return scale[..., None] * v


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation (used by node merging, reference
    ``graph_slam/src/graph_slam_node.cpp:890-1062``)."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    # log-space interpolation: q0 * (q0^-1 q1)^t
    rel = quat_mul(quat_conj(q0), q1)
    phi = quat_to_axis_angle(rel)
    return quat_mul(q0, quat_from_axis_angle(t[..., None] * phi if jnp.ndim(t) else t * phi))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_hat(phi: jax.Array) -> jax.Array:
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) -> rotation matrix, Rodrigues with Taylor fallback."""
    theta = _safe_norm(phi)
    small = theta < _EPS
    t2 = theta * theta
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    K = so3_hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3) — needed by SE(3) exp/log V matrix."""
    theta = _safe_norm(phi)
    small = theta < _EPS
    t2 = theta * theta
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, t2 * theta))
    K = so3_hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * (K @ K)


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta = _safe_norm(phi)
    small = theta < _EPS
    t2 = theta * theta
    half = 0.5 * theta
    # 1/t^2 - (1+cos t)/(2 t sin t)  ==  (1 - t/2 * cot(t/2)) / t^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))) / jnp.where(small, 1.0, t2),
    )
    K = so3_hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * (K @ K)


# ---------------------------------------------------------------------------
# SE(3) poses as (..., 7) = [t(3), q(4 wxyz)]
# ---------------------------------------------------------------------------

def pose_identity(shape=()) -> jax.Array:
    p = jnp.zeros(shape + (7,))
    return p.at[..., 3].set(1.0)


def pose_t(p: jax.Array) -> jax.Array:
    return p[..., 0:3]


def pose_q(p: jax.Array) -> jax.Array:
    return p[..., 3:7]


def make_pose(t: jax.Array, q: jax.Array) -> jax.Array:
    return jnp.concatenate([t, quat_normalize(q)], axis=-1)


def pose_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b (apply b first in b's frame): T = Ta * Tb."""
    t = pose_t(a) + quat_rotate(pose_q(a), pose_t(b))
    q = quat_normalize(quat_mul(pose_q(a), pose_q(b)))
    return jnp.concatenate([t, q], axis=-1)


def pose_inverse(p: jax.Array) -> jax.Array:
    qi = quat_conj(pose_q(p))
    ti = -quat_rotate(qi, pose_t(p))
    return jnp.concatenate([ti, qi], axis=-1)


def pose_apply(p: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform points (..., 3) by poses (..., 7)."""
    return quat_rotate(pose_q(p), pts) + pose_t(p)


def pose_relative(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^-1 ∘ b."""
    return pose_compose(pose_inverse(a), b)


def pose_to_matrix(p: jax.Array) -> jax.Array:
    R = quat_to_matrix(pose_q(p))
    m = jnp.zeros(p.shape[:-1] + (4, 4), dtype=p.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(pose_t(p))
    return m.at[..., 3, 3].set(1.0)


def matrix_to_pose(m: jax.Array) -> jax.Array:
    return make_pose(m[..., :3, 3], matrix_to_quat(m[..., :3, :3]))


# ---------------------------------------------------------------------------
# SE(3) exp / log  (twist = [v(3), w(3)])
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) -> pose (..., 7)."""
    v, phi = xi[..., 0:3], xi[..., 3:6]
    q = quat_from_axis_angle(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(p: jax.Array) -> jax.Array:
    """Pose (..., 7) -> twist (..., 6)."""
    phi = quat_to_axis_angle(pose_q(p))
    Vinv = so3_left_jacobian_inv(phi)
    v = jnp.einsum("...ij,...j->...i", Vinv, pose_t(p))
    return jnp.concatenate([v, phi], axis=-1)


def pose_retract(p: jax.Array, dx: jax.Array) -> jax.Array:
    """Right-perturbation retraction: p ∘ exp(dx). The solver's update rule."""
    return pose_compose(p, se3_exp(dx))


def pose_boxminus(a: jax.Array, b: jax.Array) -> jax.Array:
    """log(b^-1 ∘ a): local coordinates of a around b."""
    return se3_log(pose_relative(b, a))


# ---------------------------------------------------------------------------
# Distances, interpolation, adjoint
# ---------------------------------------------------------------------------

def rotation_angle(q: jax.Array) -> jax.Array:
    """Absolute rotation angle of a quaternion in radians."""
    return _safe_norm(quat_to_axis_angle(q))


def pose_distance(a: jax.Array, b: jax.Array):
    """(translation distance, rotation angle) between two poses."""
    d = pose_relative(a, b)
    return _safe_norm(pose_t(d)), rotation_angle(pose_q(d))


def pose_interpolate(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Geodesic interpolation a ⊕ t·log(a⁻¹b). t in [0,1]."""
    d = se3_log(pose_relative(a, b))
    return pose_compose(a, se3_exp(t * d))


def se3_adjoint(p: jax.Array) -> jax.Array:
    """Adjoint matrix (..., 6, 6) mapping twists between frames: Ad_T."""
    R = quat_to_matrix(pose_q(p))
    tK = so3_hat(pose_t(p))
    top = jnp.concatenate([R, tK @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _se3_Q(rho: jax.Array, phi: jax.Array) -> jax.Array:
    """Barfoot's Q(ρ,φ) block of the SE(3) left Jacobian (twist = [v, w]).

    State Estimation for Robotics eq. 7.86; the off-diagonal coupling
    between translation and rotation perturbations.
    """
    t = _safe_norm(phi)
    # Switch to degree-2 Taylor well above f32 cancellation territory:
    # (t - sin t) etc. lose ~all mantissa bits below θ ≈ 1e-2, while the
    # Taylor truncation error at 1e-2 is O(θ⁴) ≈ 1e-8 — strictly better.
    small = t < 1e-2
    t2 = t * t
    t4 = t2 * t2
    one = jnp.ones_like(t)
    st, ct = jnp.sin(t), jnp.cos(t)
    # (θ - sinθ)/θ³ ; (θ²/2 + cosθ - 1)/θ⁴ ; (θ - sinθ - θ³/6)/θ⁵
    c1 = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                   (t - st) / jnp.where(small, one, t2 * t))
    c2 = jnp.where(small, 1.0 / 24.0 - t2 / 720.0,
                   (t2 / 2.0 + ct - 1.0) / jnp.where(small, one, t4))
    c3 = jnp.where(small, -1.0 / 120.0 + t2 / 5040.0,
                   (t - st - t2 * t / 6.0) / jnp.where(small, one, t4 * t))
    rx = so3_hat(rho)
    px = so3_hat(phi)
    pxrx = px @ rx
    rxpx = rx @ px
    pxrxpx = pxrx @ px
    Q = (
        0.5 * rx
        + c1[..., None, None] * (pxrx + rxpx + pxrxpx)
        + c2[..., None, None] * (px @ pxrx + rxpx @ px - 3.0 * pxrxpx)
        + 0.5 * (c2 + 3.0 * c3)[..., None, None] * (pxrxpx @ px + px @ pxrxpx)
    )
    return Q


def se3_left_jacobian_inv(xi: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SE(3) at twist xi = [v, w]: (..., 6, 6).

    Block form [[J⁻¹, -J⁻¹ Q J⁻¹], [0, J⁻¹]] with J = so3 left Jacobian.
    """
    rho, phi = xi[..., 0:3], xi[..., 3:6]
    Jinv = so3_left_jacobian_inv(phi)
    Q = _se3_Q(rho, phi)
    top_right = -Jinv @ Q @ Jinv
    zeros = jnp.zeros_like(Jinv)
    top = jnp.concatenate([Jinv, top_right], axis=-1)
    bot = jnp.concatenate([zeros, Jinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_right_jacobian_inv(xi: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SE(3): Jr⁻¹(ξ) = Jl⁻¹(-ξ).

    d/dε log(exp(ξ)·exp(ε)) |₀ = Jr⁻¹(ξ) — the analytic form of the
    edge-residual Jacobian wrt the 'to' vertex (the solver's hot path,
    replacing 12 jacfwd passes of the full residual per edge)."""
    return se3_left_jacobian_inv(-xi)


def yaw_of(q: jax.Array) -> jax.Array:
    """Yaw (heading) angle extracted from a quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def roll_of(q: jax.Array) -> jax.Array:
    """Roll (Euler x) angle extracted from a quaternion — the reference's
    ``toEuler(...)(0)`` used for GIST roll compensation
    (``feature_extraction_core.cpp:137-149``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))


def pose2_to_pose(xyt: jax.Array) -> jax.Array:
    """Planar (x, y, theta) -> SE(3) pose."""
    x, y, th = xyt[..., 0], xyt[..., 1], xyt[..., 2]
    zeros = jnp.zeros_like(x)
    t = jnp.stack([x, y, zeros], axis=-1)
    q = jnp.stack([jnp.cos(th / 2), zeros, zeros, jnp.sin(th / 2)], axis=-1)
    return jnp.concatenate([t, q], axis=-1)


def pose_to_pose2(p: jax.Array) -> jax.Array:
    """SE(3) pose -> planar (x, y, theta)."""
    return jnp.stack([p[..., 0], p[..., 1], yaw_of(pose_q(p))], axis=-1)
