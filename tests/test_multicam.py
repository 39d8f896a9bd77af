"""Multi-camera pipeline test: front + rear camera rig (BASELINE.md config 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import EdgeEstimationConfig, KeyframeConfig, SlamConfig
from uzliti_slam_tpu.io import simulator
from uzliti_slam_tpu.ops import lie


def two_cam_rig():
    """Front camera and a second camera pitched/posed differently."""
    front = simulator.cam_extrinsic()
    # rear camera: rotate 180 deg about z (looks along -x)
    rot = lie.pose2_to_pose(jnp.array([0.0, 0.0, np.pi]))
    rear = lie.pose_compose(rot, front)
    return jnp.stack([front, rear])


class TestMultiCam:
    @pytest.mark.slow
    def test_two_camera_keyframes(self):
        cfg = SlamConfig(
            node_capacity=32, edge_capacity=128, feats_per_node=64, scan_bins=180,
            keyframe=KeyframeConfig(new_node_distance=0.2),
            estimation=EdgeEstimationConfig(min_consensus=8, min_matching_score=6.0),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=8, odom_drift=0.02, length=2.0)
        rig = two_cam_rig()
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=rig)
        slam.optimize_every = 10**9
        for fr in frames:
            # both cameras see the same rendered frame (world is a wall in
            # front; rear camera sees empty space -> fewer features)
            img2 = jnp.stack([fr["image"], jnp.full_like(fr["image"], 30.0)])
            dep2 = jnp.stack([fr["depth"], jnp.zeros_like(fr["depth"])])
            slam.add_frame(img2, dep2, fr["odom_pose"], fr["stamp"])
        slam.optimize()
        g = slam.state.graph
        n = int(g.num_nodes)
        assert n >= 6
        assert bool(jnp.all(jnp.isfinite(g.pose[:n])))
        # features from the front camera populated the banks
        assert int(slam.state.desc_valid.sum()) > 50

    def test_feature_budget_divisibility_check(self):
        cfg = SlamConfig(node_capacity=16, edge_capacity=32, feats_per_node=64, scan_bins=90)
        world = simulator.WallWorld(img_h=96, img_w=128)
        fr = simulator.simulate_sequence(world, n_frames=1)[0]
        rig = jnp.stack([simulator.cam_extrinsic()] * 3)  # 64 not divisible by 3
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=rig)
        import pytest
        with pytest.raises(ValueError, match="not divisible"):
            img3 = jnp.stack([fr["image"]] * 3)
            dep3 = jnp.stack([fr["depth"]] * 3)
            slam.add_frame(img3, dep3, fr["odom_pose"], fr["stamp"])

    @pytest.mark.slow
    def test_single_cam_unchanged(self):
        """C=1 path must behave exactly as the unbatched input."""
        cfg = SlamConfig(
            node_capacity=16, edge_capacity=64, feats_per_node=64, scan_bins=90,
            keyframe=KeyframeConfig(new_node_distance=0.2),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=4, odom_drift=0.02, length=1.5)
        s1 = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        s2 = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic()[None])
        s1.optimize_every = s2.optimize_every = 10**9
        for fr in frames:
            s1.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
            s2.add_frame(fr["image"][None], fr["depth"][None], fr["odom_pose"], fr["stamp"])
        np.testing.assert_allclose(
            np.asarray(s1.state.graph.pose), np.asarray(s2.state.graph.pose), atol=1e-6
        )
