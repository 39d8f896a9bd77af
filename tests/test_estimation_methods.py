"""Selectable registration estimator (VERDICT r3 #8): the pipeline's
``estimation.method`` switch mirrors the reference's estimator choice
(``graph_slam_node.cpp:49``; ``cloud_transformation_estimator.cpp:144-153``
and the EPnP twin ``feature_transformation_estimator.cpp:136-144`` are the
swappable alternatives). Every method runs the same sequence through
``process_keyframe`` and must propose/validate closures and beat odometry.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig, KeyframeConfig, SlamConfig,
)
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import simulator, synthetic


def run_method(method: str, **est_kw):
    cfg = SlamConfig(
        node_capacity=64, edge_capacity=256, feats_per_node=96, scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(
            method=method, min_consensus=10, min_matching_score=8.0, **est_kw
        ),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=24, odom_drift=0.08, length=5.0
    )
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 12
    for fr in frames:
        slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
    slam.optimize()
    g = slam.state.graph
    n = int(g.num_nodes)
    ne = int(g.num_edges)
    stamps = np.asarray(g.stamp[:n]).astype(int)
    gt = jnp.stack([frames[s]["gt_pose"] for s in stamps])
    odo = jnp.stack([frames[s]["odom_pose"] for s in stamps])
    ate = float(synthetic.ate_rmse(g.pose[:n], gt))
    ate_odo = float(synthetic.ate_rmse(odo, gt))
    lc = np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_FULL
    ev = np.asarray(g.e_valid[:ne]).astype(bool)
    return slam, ate, ate_odo, int(lc.sum()), int(ev[lc].sum())


class TestEstimationMethods:
    @pytest.mark.slow
    def test_pnp_method(self):
        slam, ate, ate_odo, n_lc, n_val = run_method("pnp")
        assert n_lc >= 3, "pnp proposed no closures"
        assert n_val >= 1, "filter validated none of the pnp closures"
        assert ate <= ate_odo + 1e-6
        assert ate < 0.2

    @pytest.mark.slow
    def test_gicp_method(self):
        slam, ate, ate_odo, n_lc, n_val = run_method(
            "gicp", gicp_max_voxels=192
        )
        assert slam.state.clouds is not None
        assert int(np.asarray(slam.state.cloud_valid).any(axis=-1).sum()) >= 10
        assert n_lc >= 3, "gicp proposed no closures"
        assert n_val >= 1
        assert ate <= ate_odo + 1e-6

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            run_method("teleport")
