"""Dense colored-cloud registration tests (CloudTransformationEstimator
parity, SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.ops import gicp, lie

KEY = jax.random.PRNGKey(0)


def colored_room(key, n=800):
    """Points on three walls with distinct colors."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    v = jax.random.uniform(k2, (n,))
    wall = jnp.arange(n) % 3
    x = jnp.where(wall == 0, 2.0, jnp.where(wall == 1, u * 2, u * 2))
    y = jnp.where(wall == 0, u * 2 - 1, jnp.where(wall == 1, 1.0, -1.0))
    z = v
    pts = jnp.stack([x, y, z], axis=-1)
    rgb = jnp.stack(
        [
            jnp.where(wall == 0, 0.9, 0.1),
            jnp.where(wall == 1, 0.9, 0.1),
            jnp.where(wall == 2, 0.9, 0.1),
        ],
        axis=-1,
    )
    return pts, rgb


class TestLab:
    def test_reference_values(self):
        lab = gicp.rgb_to_lab(jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(lab[0]), [100.0, 0.0, 0.0], atol=0.5)
        np.testing.assert_allclose(np.asarray(lab[1]), [0.0, 0.0, 0.0], atol=0.5)

    def test_distinct_hues(self):
        lab = gicp.rgb_to_lab(jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
        assert float(jnp.linalg.norm(lab[0] - lab[1])) > 50


class TestVoxel:
    def test_reduces_and_averages(self):
        pts = jnp.array([[0.01, 0.01, 0.0], [0.02, 0.02, 0.0], [1.0, 1.0, 1.0]])
        cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        p, c, v = gicp.voxel_downsample(pts, cols, jnp.ones(3, bool), 0.05, 16)
        assert int(v.sum()) == 2
        got = np.asarray(p)[np.asarray(v)]
        assert any(np.allclose(g, [0.015, 0.015, 0.0], atol=1e-6) for g in got)

    def test_invalid_dropped(self):
        pts = jnp.zeros((4, 3))
        cols = jnp.zeros((4, 3))
        p, c, v = gicp.voxel_downsample(pts, cols, jnp.zeros(4, bool), 0.05, 8)
        assert int(v.sum()) == 0


class TestGicp:
    def test_recovers_transform(self):
        pts, rgb = colored_room(KEY)
        true_pose = lie.se3_exp(jnp.array([0.08, -0.05, 0.03, 0.02, -0.03, 0.05]))
        # src in its own frame: dst = T(true) src
        src = lie.pose_apply(lie.pose_inverse(true_pose)[None], pts)
        res = gicp.register_clouds(
            None, src, rgb, jnp.ones(src.shape[0], bool),
            pts, rgb, jnp.ones(pts.shape[0], bool),
        )
        assert bool(res.ok)
        dt, dr = lie.pose_distance(res.pose, true_pose)
        # accuracy floor ≈ voxel size (src/dst are voxelized in different
        # frames, so voxel means don't correspond exactly — same as PCL)
        assert float(dt) < 0.05 and float(dr) < 0.03
        assert float(res.fraction) > 0.8

    def test_rejects_disjoint_clouds(self):
        pts, rgb = colored_room(KEY)
        far = pts + jnp.array([50.0, 0.0, 0.0])
        res = gicp.register_clouds(
            None, pts, rgb, jnp.ones(pts.shape[0], bool),
            far, rgb, jnp.ones(far.shape[0], bool),
        )
        assert not bool(res.ok)

    def test_color_disambiguates(self):
        """Two parallel identical walls, different colors: geometry alone is
        ambiguous (could snap to either), color picks the right one."""
        n = 300
        u = jax.random.uniform(KEY, (n,))
        v = jax.random.uniform(jax.random.PRNGKey(1), (n,))
        wallـa = jnp.stack([jnp.zeros(n), u * 2, v], axis=-1)
        wall_b = jnp.stack([jnp.full((n,), 0.3), u * 2, v], axis=-1)
        dst = jnp.concatenate([wallـa, wall_b])
        cols = jnp.concatenate([
            jnp.tile(jnp.array([[1.0, 0, 0]]), (n, 1)),
            jnp.tile(jnp.array([[0, 0, 1.0]]), (n, 1)),
        ])
        # src = red wall only, slightly offset toward the blue wall
        src = wallـa + jnp.array([0.12, 0.0, 0.0])
        src_cols = cols[:n]
        res = gicp.gicp_6d(
            src, gicp.rgb_to_lab(src_cols), jnp.ones(n, bool),
            dst, gicp.rgb_to_lab(cols), jnp.ones(2 * n, bool),
            max_corr_dist=0.4, color_weight=0.01,
        )
        # must snap back to the red wall: x-translation ≈ -0.12, not +0.18
        assert float(res.pose[0]) < -0.05

    def test_information_fixed_model(self):
        pts, rgb = colored_room(KEY)
        res = gicp.register_clouds(
            None, pts, rgb, jnp.ones(pts.shape[0], bool),
            pts, rgb, jnp.ones(pts.shape[0], bool),
        )
        info = np.asarray(res.information)
        assert info[0, 0] == 100.0 and info[3, 3] == 400.0
