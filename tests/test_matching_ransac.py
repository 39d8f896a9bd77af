"""Tests for Hamming matching and batched RANSAC (SURVEY.md §7 phase 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.ops import lie, matching, ransac

KEY = jax.random.PRNGKey(0)


class TestBits:
    def test_pack_unpack_roundtrip(self):
        packed = jax.random.randint(KEY, (40, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        bits = matching.unpack_bits(packed)
        assert bits.shape == (40, 256)
        assert set(np.unique(np.asarray(bits))) <= {0.0, 1.0}
        np.testing.assert_array_equal(np.asarray(matching.pack_bits(bits)), np.asarray(packed))


class TestHamming:
    def test_matches_numpy_popcount(self):
        a = jax.random.randint(KEY, (30, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        b = jax.random.randint(jax.random.PRNGKey(1), (50, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        dm = np.asarray(matching.hamming_matrix_packed(a, b))
        an = np.asarray(a)
        bn = np.asarray(b)
        ref = np.zeros((30, 50))
        for i in range(30):
            for j in range(50):
                ref[i, j] = bin(
                    int.from_bytes(an[i].tobytes(), "little")
                    ^ int.from_bytes(bn[j].tobytes(), "little")
                ).count("1")
        np.testing.assert_allclose(dm, ref, atol=0.01)

    def test_self_distance_zero(self):
        a = jax.random.randint(KEY, (16, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        dm = np.asarray(matching.hamming_matrix_packed(a, a))
        np.testing.assert_allclose(np.diag(dm), np.zeros(16), atol=0.01)


class TestMatchPipeline:
    def test_finds_permuted_matches(self):
        a = jax.random.randint(KEY, (64, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        perm = jax.random.permutation(jax.random.PRNGKey(2), 64)
        b = a[perm]
        mi, ok, dist = matching.match_descriptors(
            matching.unpack_bits(a), matching.unpack_bits(b),
            ratio=0.99, max_dist=10.0,
        )
        # every descriptor should match its permuted copy exactly
        inv = np.empty(64, dtype=int)
        inv[np.asarray(perm)] = np.arange(64)
        matched = np.asarray(ok)
        assert matched.sum() >= 60  # rare duplicate descriptors may fail ratio
        np.testing.assert_array_equal(
            np.asarray(mi)[matched], inv[matched.nonzero()[0]]
        )

    def test_invalid_masks(self):
        a = jax.random.randint(KEY, (16, 32), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        bits = matching.unpack_bits(a)
        valid_b = jnp.zeros(16, dtype=bool).at[:8].set(True)
        mi, ok, _ = matching.match_descriptors(bits, bits, valid_b=valid_b, ratio=0.8)
        assert np.all(np.asarray(mi)[np.asarray(ok)] < 8)


class TestKabsch:
    def test_exact_recovery(self):
        true_pose = lie.se3_exp(jnp.array([0.5, -0.2, 0.3, 0.2, -0.1, 0.4]))
        src = jax.random.normal(KEY, (20, 3))
        dst = lie.pose_apply(true_pose, src)
        est = ransac.kabsch(src, dst, jnp.ones(20))
        dt, dr = lie.pose_distance(est, true_pose)
        assert float(dt) < 1e-4 and float(dr) < 1e-4

    def test_weighted_ignores_zero_weight_outliers(self):
        true_pose = lie.se3_exp(jnp.array([0.1, 0.2, -0.3, 0.0, 0.1, -0.2]))
        src = jax.random.normal(KEY, (20, 3))
        dst = lie.pose_apply(true_pose, src)
        dst = dst.at[0].set(jnp.array([100.0, 100.0, 100.0]))
        w = jnp.ones(20).at[0].set(0.0)
        est = ransac.kabsch(src, dst, w)
        dt, dr = lie.pose_distance(est, true_pose)
        assert float(dt) < 1e-4 and float(dr) < 1e-4


class TestRansac:
    def _make_problem(self, key, m=100, outlier_frac=0.4, noise=0.005):
        k1, k2, k3 = jax.random.split(key, 3)
        true_pose = lie.se3_exp(
            jnp.array([0.4, -0.3, 0.2, 0.15, -0.25, 0.1])
        )
        src = 2.0 * jax.random.normal(k1, (m, 3))
        dst = lie.pose_apply(true_pose, src) + noise * jax.random.normal(k2, (m, 3))
        n_out = int(m * outlier_frac)
        dst = dst.at[m - n_out:].add(3.0 * jax.random.normal(k3, (n_out, 3)))
        return true_pose, src, dst

    def test_rejects_outliers(self):
        true_pose, src, dst = self._make_problem(KEY)
        res = ransac.ransac_rigid(
            jax.random.PRNGKey(5), src, dst, jnp.ones(100, dtype=bool),
            n_hypotheses=256, inlier_thresh=0.05, min_consensus=12,
        )
        assert bool(res.ok)
        assert int(res.consensus) >= 55
        dt, dr = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.02 and float(dr) < 0.02

    def test_fails_on_pure_noise(self):
        k1, k2 = jax.random.split(KEY)
        src = jax.random.normal(k1, (60, 3)) * 3
        dst = jax.random.normal(k2, (60, 3)) * 3
        res = ransac.ransac_rigid(
            jax.random.PRNGKey(5), src, dst, jnp.ones(60, dtype=bool),
            n_hypotheses=128, inlier_thresh=0.05, min_consensus=12,
        )
        assert not bool(res.ok)

    def test_batched(self):
        keys = jax.random.split(KEY, 4)
        problems = [self._make_problem(k) for k in keys]
        src = jnp.stack([p[1] for p in problems])
        dst = jnp.stack([p[2] for p in problems])
        valid = jnp.ones((4, 100), dtype=bool)
        rkeys = jax.random.split(jax.random.PRNGKey(9), 4)
        res = ransac.ransac_rigid_batch(rkeys, src, dst, valid, 256, 0.05, 12)
        assert np.all(np.asarray(res.ok))
        for b, (tp, _, _) in enumerate(problems):
            dt, dr = lie.pose_distance(res.pose[b], tp)
            assert float(dt) < 0.02 and float(dr) < 0.02

    def test_information_model(self):
        true_pose, src, dst = self._make_problem(KEY, outlier_frac=0.0)
        res = ransac.ransac_rigid(
            jax.random.PRNGKey(5), src, dst, jnp.ones(100, dtype=bool),
            n_hypotheses=128, inlier_thresh=0.05, min_consensus=12,
        )
        info = np.asarray(res.information)
        assert info[0, 0] > 0
        np.testing.assert_allclose(info[3, 3], info[0, 0] * 100.0, rtol=1e-5)

    def test_respects_validity_mask(self):
        true_pose, src, dst = self._make_problem(KEY, outlier_frac=0.0)
        # corrupt second half but mark invalid
        dst = dst.at[50:].set(jax.random.normal(jax.random.PRNGKey(3), (50, 3)) * 10)
        valid = jnp.arange(100) < 50
        res = ransac.ransac_rigid(
            jax.random.PRNGKey(5), src, dst, valid,
            n_hypotheses=256, inlier_thresh=0.05, min_consensus=12,
        )
        assert bool(res.ok)
        assert int(res.consensus) <= 50
        dt, _ = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.02
