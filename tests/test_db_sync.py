"""Live sync_to_database + kill-and-resume (VERDICT r3 #6).

The reference write-throughs storage on every addNode/addEdge when
``sync_to_database`` is set (``slam_graph.cpp:154-156,166-174,337-339``,
``iti_slam_launch/yaml/global_slam.yaml:3``) and rebuilds the PR index on
load (``graph_slam_node.cpp:875-888``). Here: run a sequence with the DB
on, drop the entire process state, construct a fresh Slam on the same DB,
and the trajectory/banks/PR must carry over.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig, KeyframeConfig, SlamConfig,
)
from uzliti_slam_tpu.io import simulator, synthetic


def make_cfg(tmp_path, **kw):
    # shape/config quadruple matches test_pipeline's standard so compiled
    # pipeline programs dedupe through the shared persistent cache
    return SlamConfig(
        node_capacity=64, edge_capacity=256, feats_per_node=96, scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
        sync_to_database=os.path.join(str(tmp_path), "graph.db"),
        **kw,
    )


class TestKillAndResume:
    @pytest.mark.slow
    def test_trajectory_survives_restart(self, tmp_path):
        cfg = make_cfg(tmp_path)
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(
            world, n_frames=24, odom_drift=0.05, length=5.0
        )
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10 ** 9
        split = 16
        for fr in frames[:split]:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        slam.optimize()
        g1 = slam.state.graph
        poses_before = np.asarray(g1.pose[: int(g1.num_nodes)])
        n_kf_before = slam._n_kf_host
        ne_before = int(g1.num_edges)
        slam._db.close()
        del slam  # the "kill"

        # resurrect from the database alone
        slam2 = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam2.optimize_every = 10 ** 9
        g2 = slam2.state.graph
        assert slam2._n_kf_host == n_kf_before
        assert int(g2.num_edges) == ne_before
        n = int(g2.num_nodes)
        np.testing.assert_allclose(
            np.asarray(g2.pose[:n]), poses_before, atol=1e-6
        )
        # banks restored
        assert np.asarray(slam2.state.desc_valid).any()
        assert np.asarray(slam2.state.scan_valid).sum() >= n - 1
        assert np.asarray(slam2.state.gist.valid).sum() >= n - 1

        # ...and the resumed instance keeps SLAMming: finish the run
        for fr in frames[split:]:
            slam2.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        slam2.optimize()
        g3 = slam2.state.graph
        n3 = int(g3.num_nodes)
        stamps = np.asarray(g3.stamp[:n3]).astype(int)
        gt = jnp.stack([frames[s]["gt_pose"] for s in stamps])
        odo = jnp.stack([frames[s]["odom_pose"] for s in stamps])
        ate = float(synthetic.ate_rmse(g3.pose[:n3], gt))
        ate_odo = float(synthetic.ate_rmse(odo, gt))
        assert ate < 0.2 and ate <= ate_odo + 1e-6
        # the resumed half proposed NEW closures against PRE-restart nodes
        # (PR banks really were rebuilt)
        from uzliti_slam_tpu.graph import state as gstate
        ef = np.asarray(g3.e_from[: int(g3.num_edges)])
        et_ = np.asarray(g3.e_to[: int(g3.num_edges)])
        ety = np.asarray(g3.e_type[: int(g3.num_edges)])
        cross = (
            (ety == gstate.EDGE_TYPE_3D_FULL)
            & (ef < split - 4) & (et_ >= n - 1)
        )
        assert cross.sum() > 0, "no closure across the restart boundary"

    def test_resume_grows_capacity_when_needed(self, tmp_path):
        cfg = make_cfg(tmp_path)
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(
            world, n_frames=10, odom_drift=0.03, length=3.0
        )
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10 ** 9
        for fr in frames:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        slam.optimize()
        n_before = int(slam.state.graph.num_nodes)
        slam._db.close()

        small = dataclasses.replace(cfg, node_capacity=8, edge_capacity=16)
        slam2 = pipeline.Slam(small, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        assert slam2.config.node_capacity >= 16
        assert int(slam2.state.graph.num_nodes) == n_before >= 8
