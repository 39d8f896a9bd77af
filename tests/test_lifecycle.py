"""Lifecycle tests: keyframe trigger, scope eviction, node merge, growth
(SURVEY.md §7 phase 8)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import lifecycle, solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


class TestKeyframe:
    def test_trigger_on_distance(self):
        a = lie.pose_identity()
        b = lie.make_pose(jnp.array([0.35, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        assert bool(lifecycle.keyframe_due(a, b))

    def test_trigger_on_rotation(self):
        a = lie.pose_identity()
        b = lie.make_pose(jnp.zeros(3), lie.quat_from_axis_angle(jnp.array([0, 0, 0.3])))
        assert bool(lifecycle.keyframe_due(a, b))  # 17 deg > 10

    def test_no_trigger_small_motion(self):
        a = lie.pose_identity()
        b = lie.make_pose(jnp.array([0.1, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        assert not bool(lifecycle.keyframe_due(a, b))


class TestScope:
    def test_radius(self):
        assert float(lifecycle.scope_radius(jnp.asarray(10.0))) == 8.0
        assert float(lifecycle.scope_radius(jnp.asarray(200.0))) == 20.0

    def test_evict_out_of_scope(self):
        g, _ = synthetic.make_pose_graph(KEY, 50, radius=10.0)
        center = g.pose[49]
        mask = lifecycle.out_of_scope_mask(g, center, jnp.asarray(8.0), margin=4.0)
        g2 = lifecycle.evict_nodes(g, mask)
        # nodes near the current pose survive
        assert bool(g2.node_valid[49]) and bool(g2.node_valid[45])
        # far-side-of-circle nodes (diametrically opposite) are evicted
        d = np.linalg.norm(
            np.asarray(lie.pose_t(g.pose[:50]) - lie.pose_t(center)[None]), axis=-1
        )
        far = np.where(d > 12.0)[0]
        assert len(far) > 0
        assert not np.any(np.asarray(g2.node_valid)[far])
        # edges to evicted nodes died
        ev = np.asarray(g2.e_valid)
        ef = np.asarray(g2.e_from)
        et = np.asarray(g2.e_to)
        nv = np.asarray(g2.node_valid)
        assert not np.any(ev & (~nv[ef] | ~nv[et]))

    def test_shipped_gate(self):
        g, _ = synthetic.make_pose_graph(KEY, 20, radius=10.0)
        shipped = jnp.zeros(g.node_capacity, dtype=bool)  # nothing ACKed
        mask = lifecycle.out_of_scope_mask(
            g, g.pose[19], jnp.asarray(2.0), shipped=shipped
        )
        assert not bool(mask.any())


class TestMerge:
    def _dense_revisit_graph(self):
        """Two overlapping laps -> duplicate nodes at same positions."""
        g, _ = synthetic.make_pose_graph(
            KEY, 40, odom_noise=0.0, rot_noise=0.0, loops=2.0, radius=3.0,
            node_capacity=64, edge_capacity=128,
        )
        return g

    def test_find_pairs_disjoint(self):
        g = self._dense_revisit_graph()
        center = lie.make_pose(jnp.array([100.0, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        ki, ai, ok = lifecycle.find_merge_pairs(
            g, center, jnp.asarray(1.0), dist_thresh=0.3, angle_thresh_deg=20.0
        )
        ki, ai, okn = np.asarray(ki), np.asarray(ai), np.asarray(ok)
        assert okn.sum() > 0
        used = list(ki[okn]) + list(ai[okn])
        assert len(used) == len(set(used))  # disjoint
        # keep is older
        stamps = np.asarray(g.stamp)
        assert np.all(stamps[ki[okn]] < stamps[ai[okn]])

    def test_merge_preserves_graph_consistency(self):
        g = self._dense_revisit_graph()
        center = lie.make_pose(jnp.array([100.0, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        g2, n_merged = lifecycle.merge_step(
            g, center, jnp.asarray(1.0), dist_thresh=0.3, angle_thresh_deg=20.0
        )
        assert int(n_merged) > 0
        nv = np.asarray(g2.node_valid)
        ev = np.asarray(g2.e_valid)
        ef = np.asarray(g2.e_from)
        et = np.asarray(g2.e_to)
        # all valid edges reference valid nodes, no self loops
        assert np.all(nv[ef[ev]])
        assert np.all(nv[et[ev]])
        assert np.all(ef[ev] != et[ev])
        assert int(g.node_valid.sum()) - int(n_merged) == int(g2.node_valid.sum())

    def test_merged_graph_still_optimizes(self):
        g = self._dense_revisit_graph()
        center = lie.make_pose(jnp.array([100.0, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        g2, n_merged = lifecycle.merge_step(
            g, center, jnp.asarray(1.0), dist_thresh=0.3, angle_thresh_deg=20.0
        )
        g3, stats = solver.optimize(g2, solver.SolverConfig(iterations=10))
        hist = np.asarray(stats.chi2_history)
        assert np.isfinite(hist[-1])
        # rewired measurements stay consistent: chi2 small
        assert hist[-1] < 1.0

    def test_merge_transform_rewrite_exact(self):
        """After merging perfectly-overlapping nodes, rewired odometry edges
        must still have ~zero residual at the (averaged) poses."""
        g = self._dense_revisit_graph()
        center = lie.make_pose(jnp.array([100.0, 0, 0]), jnp.array([1.0, 0, 0, 0]))
        g2, _ = lifecycle.merge_step(
            g, center, jnp.asarray(1.0), dist_thresh=0.3, angle_thresh_deg=20.0
        )
        chi2 = float(solver.total_chi2(g2, g2.pose, 1.0))
        assert chi2 < 1e-2


class TestGrowth:
    def test_grow_preserves_content(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g2 = lifecycle.ensure_capacity(g, 100, 200)
        assert g2.node_capacity >= 100 and g2.edge_capacity >= 200
        np.testing.assert_allclose(np.asarray(g2.pose[:20]), np.asarray(g.pose[:20]))
        assert not np.any(np.asarray(g2.node_valid[20:]))
        assert not np.any(np.asarray(g2.e_valid[19:]))
        # padded poses are identity (unit quaternion) so lie ops stay finite
        assert np.allclose(np.asarray(g2.pose[50, 3]), 1.0)

    def test_noop_when_enough(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g2 = lifecycle.ensure_capacity(g, 10, 10)
        assert g2.node_capacity == g.node_capacity

    def test_grown_graph_optimizes(self):
        g, _ = synthetic.make_pose_graph(KEY, 30, loop_closure_every=10)
        g2 = lifecycle.ensure_capacity(g, 64, 128)
        g3, stats = solver.optimize(g2, solver.SolverConfig(iterations=5))
        assert np.isfinite(float(stats.chi2_history[-1]))


class TestCompaction:
    """VERDICT r1 #3: slot reclamation — eviction/merge must actually free
    capacity (reference removeNode, slam_graph.cpp:216-229)."""

    def _evicted_graph(self):
        g, _ = synthetic.make_pose_graph(KEY, 40, loop_closure_every=5)
        dead = jnp.zeros((g.node_capacity,), bool).at[5:25].set(True)
        return lifecycle.evict_nodes(g, dead), dead

    def test_compact_shrinks_highwater_and_preserves_live(self):
        g, dead = self._evicted_graph()
        live_uids = np.asarray(g.node_uid)[np.asarray(g.node_valid)]
        live_poses = np.asarray(g.pose)[np.asarray(g.node_valid)]
        g2, perm = lifecycle.compact_graph(g)
        assert int(g2.num_nodes) == 20
        assert bool(jnp.all(g2.node_valid[:20]))
        assert not bool(jnp.any(g2.node_valid[20:]))
        # stable order: live nodes keep their relative order
        np.testing.assert_array_equal(np.asarray(g2.node_uid[:20]), live_uids)
        np.testing.assert_allclose(np.asarray(g2.pose[:20]), live_poses)

    def test_compact_remaps_edges(self):
        g, dead = self._evicted_graph()
        g2, perm = lifecycle.compact_graph(g)
        ne = int(g2.num_edges)
        ef = np.asarray(g2.e_from[:ne])
        et = np.asarray(g2.e_to[:ne])
        assert ne > 0
        # every surviving edge points at live slots and preserves its
        # relative transform between the same uids
        uid = np.asarray(g2.node_uid)
        old_uid = np.asarray(g.node_uid)
        old_valid = np.asarray(g.e_valid)
        old_pairs = {
            (int(old_uid[f]), int(old_uid[t]))
            for f, t, v in zip(np.asarray(g.e_from), np.asarray(g.e_to), old_valid)
            if v
        }
        for f, t in zip(ef, et):
            assert f < 20 and t < 20
            assert (int(uid[f]), int(uid[t])) in old_pairs

    def test_compact_solve_equivalent(self):
        # optimizing the compacted graph == optimizing the evicted graph
        g, dead = self._evicted_graph()
        g2, _ = lifecycle.compact_graph(g)
        ga, _ = solver.optimize(g, solver.SolverConfig(iterations=10))
        gb, _ = solver.optimize(g2, solver.SolverConfig(iterations=10))
        pa = np.asarray(ga.pose)[np.asarray(ga.node_valid)]
        pb = np.asarray(gb.pose)[np.asarray(gb.node_valid)]
        np.testing.assert_allclose(pa, pb, atol=1e-4)

    def test_add_after_compact_reuses_slots(self):
        g, dead = self._evicted_graph()
        g2, _ = lifecycle.compact_graph(g)
        g3, slot = gstate.add_node(
            g2, lie.pose_identity(), lie.pose_identity(), jnp.asarray(99.0),
            uid=12345,
        )
        assert int(slot) == 20  # the first freed slot


@pytest.mark.slow
class TestBoundedScopeLongRun:
    """VERDICT r1 #3 acceptance: a 500+-keyframe run with an 8 m scope
    window never grows past its initial capacity tier."""

    def test_long_run_stays_in_one_tier(self):
        import dataclasses

        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import (
            EdgeEstimationConfig, KeyframeConfig, PlaceRecognitionConfig,
            ScopeConfig, SlamConfig,
        )
        from uzliti_slam_tpu.io import simulator
        from uzliti_slam_tpu.ops import lie as _lie

        cfg = SlamConfig(
            node_capacity=128, edge_capacity=1024, feats_per_node=64,
            scan_bins=90,
            keyframe=KeyframeConfig(
                new_node_distance=0.0, new_node_angle_deg=0.0,
                distance_closure_radius=1.0,
            ),
            recognition=PlaceRecognitionConfig(k_candidates=2),
            estimation=EdgeEstimationConfig(ransac_hypotheses=32),
            scope=ScopeConfig(is_sub_graph=True, scope_size_min=8.0),
        )
        world = simulator.WallWorld(img_h=96, img_w=128, f=110.0)
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10 ** 9

        n_frames = 520
        step_m = 0.35
        compactions = 0
        for i in range(n_frames):
            ty = i * step_m
            img, dep = world.render(0.0, ty % 30.0)
            odom = np.asarray(_lie.make_pose(
                jnp.array([0.0, ty, 0.0], jnp.float32),
                jnp.array([1.0, 0, 0, 0], jnp.float32),
            ))
            slam.add_frame(img, dep, odom, float(i) * 0.2)
            if (i + 1) % 20 == 0:
                info = slam.maintain()
                if info["compact_perm"] is not None:
                    compactions += 1

        assert slam.config.node_capacity == 128, "capacity tier grew"
        assert slam.config.edge_capacity == 1024
        assert compactions >= 3
        g = slam.state.graph
        assert int(g.num_nodes) <= 128
        live = int(jnp.sum(g.node_valid))
        # live window ~ (scope 8 m + margin 4 m) / 0.35 m spacing
        assert live <= 60
        assert slam._n_kf_host == n_frames  # nothing silently dropped
