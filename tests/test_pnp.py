"""PnP RANSAC tests (EPnP-variant capability, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.ops import lie, pnp

KEY = jax.random.PRNGKey(0)
FX = FY = 500.0
CX, CY = 320.0, 240.0


def make_problem(key, m=80, noise_px=0.5, outlier_frac=0.0):
    k1, k2, k3 = jax.random.split(key, 3)
    true_pose = lie.se3_exp(jnp.array([0.2, -0.1, 0.3, 0.1, -0.15, 0.2]))
    # world points in front of the camera after transformation
    X = jnp.concatenate(
        [jax.random.uniform(k1, (m, 2), minval=-2, maxval=2),
         jax.random.uniform(k2, (m, 1), minval=3.0, maxval=8.0)],
        axis=-1,
    )
    Xc = lie.pose_apply(true_pose[None], X)
    u = Xc[:, 0] / Xc[:, 2] * FX + CX
    v = Xc[:, 1] / Xc[:, 2] * FY + CY
    uv = jnp.stack([u, v], axis=-1) + noise_px * jax.random.normal(k3, (m, 2))
    n_out = int(m * outlier_frac)
    if n_out:
        uv = uv.at[m - n_out:].add(80.0 * jax.random.normal(jax.random.PRNGKey(9), (n_out, 2)))
    return true_pose, X, uv


class TestPnp:
    def test_recovers_pose(self):
        true_pose, X, uv = make_problem(KEY)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(1), X, uv, jnp.ones(X.shape[0], bool),
            FX, FY, CX, CY,
        )
        assert bool(res.ok)
        dt, dr = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.02 and float(dr) < 0.01
        assert float(res.reproj_mse) < 2.0

    def test_robust_to_outliers(self):
        true_pose, X, uv = make_problem(KEY, outlier_frac=0.3)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(2), X, uv, jnp.ones(X.shape[0], bool),
            FX, FY, CX, CY, n_hypotheses=128,
        )
        assert bool(res.ok)
        dt, dr = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.03 and float(dr) < 0.015
        assert int(res.consensus) >= 50

    def test_rejects_garbage(self):
        k1, k2 = jax.random.split(KEY)
        X = jax.random.normal(k1, (60, 3)) * 3 + jnp.array([0, 0, 5.0])
        uv = jax.random.uniform(k2, (60, 2), minval=0, maxval=640)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(3), X, uv, jnp.ones(60, bool), FX, FY, CX, CY,
        )
        assert not bool(res.ok)

    def test_validity_mask(self):
        true_pose, X, uv = make_problem(KEY)
        # corrupt second half, mark invalid
        uv = uv.at[40:].set(0.0)
        valid = jnp.arange(80) < 40
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(4), X, uv, valid, FX, FY, CX, CY,
            min_consensus=15,
        )
        assert bool(res.ok)
        assert int(res.consensus) <= 40
        dt, _ = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.03
