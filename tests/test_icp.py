"""Point-to-line ICP tests (SURVEY.md §7 phase 4, laser edges)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.ops import icp

KEY = jax.random.PRNGKey(0)


def room_scan(key, n=180, noise=0.005):
    """Points on the walls of a 6x4 room, as seen from the origin."""
    th = jnp.linspace(-jnp.pi, jnp.pi, n, endpoint=False)
    # raycast to rectangle walls x=±3, y=±2
    c, s = jnp.cos(th), jnp.sin(th)
    tx = jnp.where(jnp.abs(c) > 1e-6, jnp.where(c > 0, 3.0, -3.0) / c, jnp.inf)
    ty = jnp.where(jnp.abs(s) > 1e-6, jnp.where(s > 0, 2.0, -2.0) / s, jnp.inf)
    t = jnp.minimum(tx, ty)
    pts = jnp.stack([t * c, t * s], axis=-1)
    if noise:
        pts = pts + noise * jax.random.normal(key, pts.shape)
    return pts


def transform_pts(pts, xyt):
    c, s = np.cos(xyt[2]), np.sin(xyt[2])
    R = np.array([[c, -s], [s, c]])
    return np.asarray(pts) @ R.T + np.asarray(xyt[:2])


class TestIcp:
    def test_recovers_known_offset(self):
        dst = room_scan(KEY)
        true_xyt = np.array([0.15, -0.1, 0.08])
        # src observed from a pose offset by true_xyt: src points in its own
        # frame correspond to dst points via T(true)
        src = jnp.asarray(transform_pts(dst, -np.array([0, 0, 0])))  # same cloud
        # move src into a different frame: p_dst = T(true) p_src
        src_in_own = jnp.asarray(
            transform_pts(np.asarray(dst) - np.array(true_xyt[:2]), [0, 0, 0])
        )
        # simpler: generate src = T(true)^-1 dst
        c, s = np.cos(true_xyt[2]), np.sin(true_xyt[2])
        R = np.array([[c, -s], [s, c]])
        src = jnp.asarray((np.asarray(dst) - true_xyt[:2]) @ R)
        ones = jnp.ones(dst.shape[0], bool)
        res = icp.icp_point_to_line(src, ones, dst, ones, jnp.zeros(3), iterations=25)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.pose2), true_xyt, atol=0.02)
        assert float(res.valid_fraction) > 0.9

    def test_uses_initial_guess(self):
        dst = room_scan(KEY)
        true_xyt = np.array([0.9, 0.5, 0.3])  # too big for cold start
        c, s = np.cos(true_xyt[2]), np.sin(true_xyt[2])
        R = np.array([[c, -s], [s, c]])
        src = jnp.asarray((np.asarray(dst) - true_xyt[:2]) @ R)
        ones = jnp.ones(dst.shape[0], bool)
        init = jnp.asarray(true_xyt + np.array([0.1, -0.08, 0.05]))
        res = icp.icp_point_to_line(src, ones, dst, ones, init, iterations=25)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.pose2), true_xyt, atol=0.03)

    def test_rejects_unrelated_scans(self):
        k1, k2 = jax.random.split(KEY)
        src = 3.0 * jax.random.normal(k1, (120, 2))
        dst = 3.0 * jax.random.normal(k2, (120, 2)) + 50.0
        ones = jnp.ones(120, bool)
        res = icp.icp_point_to_line(src, ones, dst, ones, jnp.zeros(3), iterations=15)
        assert not bool(res.ok)

    def test_correction_bound_gate(self):
        dst = room_scan(KEY)
        ones = jnp.ones(dst.shape[0], bool)
        # init wildly off: even if ICP pulls far, the correction gate trips
        init = jnp.array([10.0, 10.0, 2.0])
        res = icp.icp_point_to_line(dst, ones, dst, ones, init, iterations=25)
        # either it cannot converge (low valid fraction) or correction > bound
        assert not bool(res.ok)

    def test_covariance_shape_and_information(self):
        dst = room_scan(KEY)
        ones = jnp.ones(dst.shape[0], bool)
        res = icp.icp_point_to_line(dst, ones, dst, ones, jnp.zeros(3), iterations=10)
        cov = np.asarray(res.cov3)
        assert cov.shape == (3, 3)
        # symmetric positive definite
        np.testing.assert_allclose(cov, cov.T, atol=1e-8)
        assert np.all(np.linalg.eigvalsh(cov) > 0)
        info6 = np.asarray(icp.icp_information_6d(res.cov3))
        np.testing.assert_allclose(np.trace(info6), 1e4, rtol=1e-3)
        # only x, y, yaw blocks populated
        assert info6[2, 2] == 0 and info6[3, 3] == 0 and info6[4, 4] == 0

    def test_batched(self):
        dst = room_scan(KEY)
        ones = jnp.ones(dst.shape[0], bool)
        offs = np.array([[0.1, 0.05, 0.03], [-0.1, 0.02, -0.05], [0.0, 0.2, 0.1]])
        srcs = []
        for o in offs:
            c, s = np.cos(o[2]), np.sin(o[2])
            R = np.array([[c, -s], [s, c]])
            srcs.append((np.asarray(dst) - o[:2]) @ R)
        src = jnp.asarray(np.stack(srcs))
        B = 3
        res = icp.icp_batch(
            src, jnp.broadcast_to(ones, (B,) + ones.shape),
            jnp.broadcast_to(dst, (B,) + dst.shape),
            jnp.broadcast_to(ones, (B,) + ones.shape),
            jnp.zeros((B, 3)), 25, 0.5, 0.25, (1.5, 0.8), 0.02,
        )
        assert np.all(np.asarray(res.ok))
        np.testing.assert_allclose(np.asarray(res.pose2), offs, atol=0.03)

    def test_partial_overlap_masks(self):
        dst = room_scan(KEY)
        ones = jnp.ones(dst.shape[0], bool)
        half = jnp.arange(dst.shape[0]) < 90
        res = icp.icp_point_to_line(dst, half, dst, ones, jnp.zeros(3), iterations=10)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.pose2), np.zeros(3), atol=0.01)
