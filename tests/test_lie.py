"""Property tests for the SE(3)/SO(3) core (SURVEY.md §7 phase 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.ops import lie


def random_poses(key, n, t_scale=2.0):
    kt, kq = jax.random.split(key)
    t = t_scale * jax.random.normal(kt, (n, 3))
    q = lie.quat_normalize(jax.random.normal(kq, (n, 4)))
    return lie.make_pose(t, q)


KEY = jax.random.PRNGKey(0)
N = 64


class TestQuaternion:
    def test_mul_identity(self):
        q = lie.quat_normalize(jax.random.normal(KEY, (N, 4)))
        qi = lie.quat_identity((N,))
        np.testing.assert_allclose(lie.quat_mul(q, qi), q, atol=1e-6)
        np.testing.assert_allclose(lie.quat_mul(qi, q), q, atol=1e-6)

    def test_conj_is_inverse(self):
        q = lie.quat_normalize(jax.random.normal(KEY, (N, 4)))
        r = lie.quat_mul(q, lie.quat_conj(q))
        np.testing.assert_allclose(r, lie.quat_identity((N,)), atol=1e-6)

    def test_rotate_matches_matrix(self):
        q = lie.quat_normalize(jax.random.normal(KEY, (N, 4)))
        v = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
        Rv = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v)
        np.testing.assert_allclose(lie.quat_rotate(q, v), Rv, atol=1e-5)

    def test_matrix_roundtrip(self):
        q = lie.quat_normalize(jax.random.normal(KEY, (N, 4)))
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_axis_angle_roundtrip(self):
        # Roundtrip only holds for |phi| < pi (larger angles wrap).
        phi = jax.random.normal(KEY, (N, 3))
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True) * jax.random.uniform(
            jax.random.PRNGKey(7), (N, 1), minval=0.0, maxval=3.0
        )
        q = lie.quat_from_axis_angle(phi)
        np.testing.assert_allclose(lie.quat_to_axis_angle(q), phi, atol=1e-5)

    def test_axis_angle_small(self):
        phi = 1e-8 * jax.random.normal(KEY, (N, 3))
        q = lie.quat_from_axis_angle(phi)
        assert np.all(np.isfinite(np.asarray(q)))
        np.testing.assert_allclose(lie.quat_to_axis_angle(q), phi, atol=1e-7)

    def test_slerp_endpoints(self):
        k0, k1 = jax.random.split(KEY)
        q0 = lie.quat_normalize(jax.random.normal(k0, (N, 4)))
        q1 = lie.quat_normalize(jax.random.normal(k1, (N, 4)))
        np.testing.assert_allclose(lie.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
        # slerp(1) may differ in sign; compare rotations via relative angle
        r = lie.quat_mul(lie.quat_conj(lie.quat_slerp(q0, q1, 1.0)), q1)
        np.testing.assert_allclose(lie.rotation_angle(r), np.zeros(N), atol=1e-3)


class TestSO3:
    def test_exp_matches_quat(self):
        phi = jax.random.normal(KEY, (N, 3))
        R1 = lie.so3_exp(phi)
        R2 = lie.quat_to_matrix(lie.quat_from_axis_angle(phi))
        np.testing.assert_allclose(R1, R2, atol=1e-5)

    def test_left_jacobian_inverse(self):
        phi = jax.random.normal(KEY, (N, 3))
        J = lie.so3_left_jacobian(phi)
        Jinv = lie.so3_left_jacobian_inv(phi)
        eye = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)

    def test_left_jacobian_small_angle(self):
        phi = 1e-9 * jnp.ones((4, 3))
        J = lie.so3_left_jacobian(phi)
        Jinv = lie.so3_left_jacobian_inv(phi)
        assert np.all(np.isfinite(np.asarray(J)))
        assert np.all(np.isfinite(np.asarray(Jinv)))


class TestSE3:
    def test_compose_inverse(self):
        p = random_poses(KEY, N)
        ident = lie.pose_compose(p, lie.pose_inverse(p))
        np.testing.assert_allclose(lie.pose_t(ident), np.zeros((N, 3)), atol=1e-5)
        np.testing.assert_allclose(
            lie.rotation_angle(lie.pose_q(ident)), np.zeros(N), atol=1e-4
        )

    def test_compose_matches_matrix(self):
        k0, k1 = jax.random.split(KEY)
        a, b = random_poses(k0, N), random_poses(k1, N)
        M = lie.pose_to_matrix(a) @ lie.pose_to_matrix(b)
        np.testing.assert_allclose(
            lie.pose_to_matrix(lie.pose_compose(a, b)), M, atol=1e-5
        )

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (N, 6))
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-4)

    def test_log_exp_roundtrip(self):
        p = random_poses(KEY, N)
        p2 = lie.se3_exp(lie.se3_log(p))
        np.testing.assert_allclose(p2, p, atol=1e-4)

    def test_exp_zero(self):
        p = lie.se3_exp(jnp.zeros((N, 6)))
        np.testing.assert_allclose(p, lie.pose_identity((N,)), atol=1e-7)

    def test_apply_matches_matrix(self):
        p = random_poses(KEY, N)
        pts = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
        M = lie.pose_to_matrix(p)
        expected = jnp.einsum("nij,nj->ni", M[:, :3, :3], pts) + M[:, :3, 3]
        np.testing.assert_allclose(lie.pose_apply(p, pts), expected, atol=1e-5)

    def test_retract_boxminus(self):
        p = random_poses(KEY, N)
        dx = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (N, 6))
        p2 = lie.pose_retract(p, dx)
        np.testing.assert_allclose(lie.pose_boxminus(p2, p), dx, atol=1e-4)

    def test_matrix_roundtrip(self):
        p = random_poses(KEY, N)
        np.testing.assert_allclose(
            lie.matrix_to_pose(lie.pose_to_matrix(p)), p, atol=1e-5
        )

    def test_adjoint(self):
        # Ad_T * xi == log(T * exp(xi) * T^-1)
        p = random_poses(KEY, 8)
        xi = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (8, 6))
        lhs = jnp.einsum("nij,nj->ni", lie.se3_adjoint(p), xi)
        rhs = lie.se3_log(
            lie.pose_compose(lie.pose_compose(p, lie.se3_exp(xi)), lie.pose_inverse(p))
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-3)

    def test_pose2_roundtrip(self):
        xyt = jax.random.normal(KEY, (N, 3))
        p = lie.pose2_to_pose(xyt)
        back = lie.pose_to_pose2(p)
        np.testing.assert_allclose(back[:, :2], xyt[:, :2], atol=1e-5)
        # angles modulo 2pi
        da = np.mod(np.asarray(back[:, 2] - xyt[:, 2]) + np.pi, 2 * np.pi) - np.pi
        np.testing.assert_allclose(da, np.zeros(N), atol=1e-5)

    def test_interpolate_endpoints(self):
        k0, k1 = jax.random.split(KEY)
        a, b = random_poses(k0, N), random_poses(k1, N)
        np.testing.assert_allclose(lie.pose_interpolate(a, b, 0.0), a, atol=1e-5)
        dt, dr = lie.pose_distance(lie.pose_interpolate(a, b, 1.0), b)
        np.testing.assert_allclose(dt, np.zeros(N), atol=1e-4)
        np.testing.assert_allclose(dr, np.zeros(N), atol=1e-3)

    def test_jit_and_grad(self):
        p = random_poses(KEY, 4)

        @jax.jit
        def loss(dx):
            return jnp.sum(lie.se3_log(lie.pose_retract(p, dx)) ** 2)

        g = jax.grad(loss)(jnp.zeros((4, 6)))
        assert np.all(np.isfinite(np.asarray(g)))
