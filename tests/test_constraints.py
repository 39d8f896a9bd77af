"""Typed partial-constraint enforcement + GPS factors + planar mode
(VERDICT r1 #7; reference ``graph_slam_msgs/msg/Edge.msg`` type enums,
``g2o_optimizer.cpp:164-188`` optimize_xy_only flattening)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def _chain(n=30, **kw):
    return synthetic.make_pose_graph(KEY, n, edge_capacity=128, **kw)


class TestInfoMask:
    def test_translation_only_types(self):
        base = jnp.eye(6)
        for t in (gstate.EDGE_TYPE_3D_TRANSLATION, gstate.EDGE_TYPE_3D_GPS):
            m = np.asarray(gstate.info_for_edge_type(jnp.asarray(t), base))
            assert np.allclose(np.diag(m)[:3], 1.0)
            assert np.allclose(m[3:], 0.0)

    def test_rotation_only_type(self):
        m = np.asarray(
            gstate.info_for_edge_type(
                jnp.asarray(gstate.EDGE_TYPE_3D_ROTATION), jnp.eye(6)
            )
        )
        assert np.allclose(m[:3], 0.0)
        assert np.allclose(np.diag(m)[3:], 1.0)

    def test_wheel_odometry_keeps_full_info(self):
        # the reference's odometry info model is a FULL 6x6 despite the 2D
        # type tag (graph_slam_node.cpp:316-321)
        m = np.asarray(
            gstate.info_for_edge_type(
                jnp.asarray(gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY), jnp.eye(6)
            )
        )
        assert np.allclose(m, np.eye(6))

    def test_planar_types(self):
        for t in (gstate.EDGE_TYPE_2D_FULL, gstate.EDGE_TYPE_2D_LASER):
            m = np.asarray(gstate.info_for_edge_type(jnp.asarray(t), jnp.eye(6)))
            assert np.allclose(np.diag(m), [1, 1, 0, 0, 0, 1])

    def test_add_edge_applies_mask(self):
        g, _ = _chain(10)
        g, slot = gstate.add_edge(
            g, jnp.asarray(0, jnp.int32), jnp.asarray(5, jnp.int32),
            lie.pose_identity(), 100.0 * jnp.eye(6),
            etype=gstate.EDGE_TYPE_3D_ROTATION,
        )
        info = np.asarray(g.e_info[int(slot)])
        assert np.allclose(info[:3], 0.0)
        assert np.allclose(np.diag(info)[3:], 100.0)


class TestRotationOnlyEdge:
    def test_translation_part_is_ignored(self):
        """A rotation-only edge whose transform carries a (corrupt)
        translation must produce the same solve as one with zero
        translation — the translation block carries no information."""
        g, _ = _chain(30, loop_closure_every=7)
        q = lie.pose_q(lie.pose_relative(g.pose[2], g.pose[20]))
        corrupt = lie.make_pose(jnp.array([37.0, -12.0, 4.0]), q)
        clean = lie.make_pose(jnp.zeros(3), q)
        info = 50.0 * jnp.eye(6)
        ga, _ = gstate.add_edge(
            g, jnp.asarray(2, jnp.int32), jnp.asarray(20, jnp.int32),
            corrupt, info, etype=gstate.EDGE_TYPE_3D_ROTATION,
        )
        gb, _ = gstate.add_edge(
            g, jnp.asarray(2, jnp.int32), jnp.asarray(20, jnp.int32),
            clean, info, etype=gstate.EDGE_TYPE_3D_ROTATION,
        )
        cfg = solver.SolverConfig(iterations=10)
        pa, _ = solver.optimize(ga, cfg)
        pb, _ = solver.optimize(gb, cfg)
        np.testing.assert_allclose(
            np.asarray(pa.pose[:30]), np.asarray(pb.pose[:30]), atol=1e-5
        )

    def test_rotation_part_does_constrain(self):
        g, _ = _chain(30)
        rel_q = lie.pose_q(lie.pose_relative(g.pose[2], g.pose[20]))
        # a deliberately wrong rotation measurement must bend the solution
        wrong_q = lie.quat_mul(rel_q, lie.se3_exp(jnp.array([0, 0, 0, 0, 0, 0.5]))[3:])
        ga, _ = gstate.add_edge(
            g, jnp.asarray(2, jnp.int32), jnp.asarray(20, jnp.int32),
            lie.make_pose(jnp.zeros(3), wrong_q), 200.0 * jnp.eye(6),
            etype=gstate.EDGE_TYPE_3D_ROTATION,
        )
        cfg = solver.SolverConfig(iterations=10)
        pa, _ = solver.optimize(ga, cfg)
        pb, _ = solver.optimize(g, cfg)
        dq = np.abs(np.asarray(pa.pose[:30, 3:]) - np.asarray(pb.pose[:30, 3:]))
        assert dq.max() > 1e-3


class TestGps:
    def test_gps_anchored_graph_converges(self):
        """Drifted odometry chain + translation-only GPS fixes pulls the
        trajectory onto the fixes (no alignment in the metric)."""
        g, gt = _chain(40, odom_noise=0.08, rot_noise=0.01, node_capacity=64)
        # fixed anchor node at the origin
        g, anchor = gstate.add_node(
            g, lie.pose_identity(), lie.pose_identity(), jnp.asarray(0.0),
            fixed=True, uid=gstate.GPS_ANCHOR_UID,
        )
        for i in range(0, 40, 5):
            meas = lie.make_pose(lie.pose_t(gt[i]), jnp.array([1.0, 0, 0, 0]))
            g, _ = gstate.add_edge(
                g, anchor, jnp.asarray(i, jnp.int32), meas,
                25.0 * jnp.eye(6), etype=gstate.EDGE_TYPE_3D_GPS,
            )
        ate_before = float(synthetic.ate_rmse(g.pose[:40], gt, align=False))
        g2, _ = solver.optimize(g, solver.SolverConfig(iterations=15))
        ate_after = float(synthetic.ate_rmse(g2.pose[:40], gt, align=False))
        assert ate_after < 0.5 * ate_before
        assert ate_after < 0.25

    @pytest.mark.slow
    def test_slam_add_gps_end_to_end(self):
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import KeyframeConfig, SlamConfig
        from uzliti_slam_tpu.io import simulator

        cfg = SlamConfig(
            node_capacity=64, edge_capacity=256, feats_per_node=64,
            scan_bins=90, keyframe=KeyframeConfig(new_node_distance=0.2),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=8, odom_drift=0.03)
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10 ** 9
        assert not slam.add_gps([0.0, 0.0, 0.0])  # no keyframe yet
        for fr in frames[:4]:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        assert slam.add_gps([0.0, 1.0, 0.0], sigma=0.5)
        for fr in frames[4:]:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        assert slam.add_gps([0.0, 2.0, 0.0], sigma=0.5)  # anchor reused
        g = slam.state.graph
        uids = np.asarray(g.node_uid)
        assert (uids == gstate.GPS_ANCHOR_UID).sum() == 1
        ne = int(g.num_edges)
        gps = np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_GPS
        assert gps.sum() == 2
        # the epoch keeps GPS factors active (exempt from the cluster filter)
        slam.optimize()
        assert np.asarray(slam.state.graph.e_valid[:ne])[gps].all()
        # odometry still chains KEYFRAMES across the anchor insertion: no
        # odometry edge may touch the anchor slot
        anchor_slot = int(np.nonzero(uids == gstate.GPS_ANCHOR_UID)[0][0])
        g2 = slam.state.graph
        ne2 = int(g2.num_edges)
        odo = np.asarray(g2.e_type[:ne2]) == gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY
        assert not (np.asarray(g2.e_from[:ne2])[odo] == anchor_slot).any()
        assert not (np.asarray(g2.e_to[:ne2])[odo] == anchor_slot).any()


class TestXyOnly:
    def test_planar_mode_zeroes_z_roll_pitch(self):
        g, gt = _chain(40, loop_closure_every=8)
        # perturb initial poses out of plane
        k = jax.random.PRNGKey(3)
        dz = 0.2 * jax.random.normal(k, (g.node_capacity,))
        g = g._replace(pose=g.pose.at[:, 2].add(dz))
        cfg = solver.SolverConfig(iterations=12, optimize_xy_only=True)
        g2, stats = solver.optimize(g, cfg)
        p = np.asarray(g2.pose[:40])
        assert np.allclose(p[:, 2], 0.0, atol=1e-5)          # z
        # roll/pitch zero: quat has only w, z components
        assert np.allclose(p[:, 4:6], 0.0, atol=1e-4)
        assert np.isfinite(float(stats.chi2_history[-1]))

    def test_planar_mode_still_converges_xy(self):
        g, gt = _chain(60, odom_noise=0.05, rot_noise=0.01, loop_closure_every=5)
        ate0 = float(synthetic.ate_rmse(g.pose[:60], gt))
        g2, _ = solver.optimize(
            g, solver.SolverConfig(iterations=20, optimize_xy_only=True)
        )
        ate1 = float(synthetic.ate_rmse(g2.pose[:60], gt))
        assert ate1 < 0.5 * ate0
