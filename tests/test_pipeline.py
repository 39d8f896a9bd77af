"""End-to-end pipeline test: simulated RGB-D sequence -> SLAM -> ATE
(the minimum end-to-end slice of SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig,
    KeyframeConfig,
    SlamConfig,
)
from uzliti_slam_tpu.io import simulator, synthetic
from uzliti_slam_tpu.ops import lie


def small_config():
    return SlamConfig(
        node_capacity=64,
        edge_capacity=256,
        feats_per_node=96,
        scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
    )


@pytest.fixture(scope="module")
def run_sequence():
    cfg = small_config()
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(world, n_frames=36, odom_drift=0.08, length=5.0)
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 12
    infos = []
    for fr in frames:
        info = slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if info:
            infos.append(info)
    slam.optimize()
    return cfg, world, frames, slam, infos


class TestPipeline:
    def test_keyframes_created(self, run_sequence):
        _, _, frames, slam, infos = run_sequence
        n = int(slam.state.graph.num_nodes)
        assert 20 <= n <= 36

    def test_features_found(self, run_sequence):
        _, _, _, _, infos = run_sequence
        assert np.median([i["n_features"] for i in infos]) > 30

    def test_loop_closures_proposed(self, run_sequence):
        _, _, _, slam, infos = run_sequence
        total_proposed = sum(i["n_edges_proposed"] for i in infos)
        assert total_proposed >= 5  # return leg must re-recognize places

    def test_closures_validated_by_filter(self, run_sequence):
        from uzliti_slam_tpu.graph import state as gstate
        _, _, _, slam, _ = run_sequence
        g = slam.state.graph
        ne = int(g.num_edges)
        et = np.asarray(g.e_type[:ne])
        ev = np.asarray(g.e_valid[:ne])
        lc = et == gstate.EDGE_TYPE_3D_FULL
        assert lc.sum() >= 5
        assert ev[lc].sum() >= 3  # filter validated a consistent subset

    def test_trajectory_accuracy(self, run_sequence):
        _, _, frames, slam, _ = run_sequence
        g = slam.state.graph
        n = int(g.num_nodes)
        est = g.pose[:n]
        # ground truth at keyframe stamps
        stamps = np.asarray(g.stamp[:n]).astype(int)
        gt = jnp.stack([frames[s]["gt_pose"] for s in stamps])
        ate = float(synthetic.ate_rmse(est, gt))
        # odometry-only baseline for the same frames
        odo = jnp.stack([frames[s]["odom_pose"] for s in stamps])
        ate_odo = float(synthetic.ate_rmse(odo, gt))
        assert ate < 0.2
        assert ate <= ate_odo + 1e-6

    def test_live_map_projected(self, run_sequence):
        """optimize() ends with an occupancy projection (the reference's
        projector_->project after every solve, graph_slam_node.cpp:1277-1279):
        the WallWorld's walls must show up occupied, the traversed corridor
        free."""
        _, _, _, slam, _ = run_sequence
        assert slam.grid is not None
        tern = np.asarray(slam.map_ternary())
        assert (tern == 100).sum() > 20      # wall cells
        assert (tern == 0).sum() > 100       # traversed free space
        assert (tern == -1).sum() > 0        # outside the world unknown
        p = np.asarray(slam.map_probability())
        assert p.min() >= 0.0 and p.max() <= 1.0

    def test_diff_transform_updated(self, run_sequence):
        _, _, _, slam, _ = run_sequence
        diff = np.asarray(slam.state.graph.diff_transform)
        assert np.all(np.isfinite(diff))

    def test_state_all_finite(self, run_sequence):
        _, _, _, slam, _ = run_sequence
        for leaf in jax.tree.leaves(slam.state):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                ok = jnp.isfinite(leaf) | jnp.isinf(leaf)  # scans use +inf
                assert bool(jnp.all(ok))
