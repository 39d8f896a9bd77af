"""Live parameter retuning without recompilation (VERDICT r4 missing #3).

The reference live-tunes its numeric gates via dynamic_reconfigure
(``GraphSlam.cfg:9-34``, callbacks ``graph_slam_node.cpp:1087-1116``).
Here those gates are device scalars (``config.Tunables``) inside
SlamState: ``Slam.set_param`` must (a) change behavior and (b) trigger
ZERO new jit compilations of the keyframe step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig, KeyframeConfig, SlamConfig, tunables_from_config,
)
from uzliti_slam_tpu.io import simulator


@pytest.fixture(scope="module")
def sim():
    cfg = SlamConfig(
        node_capacity=32, edge_capacity=128, feats_per_node=64, scan_bins=90,
        keyframe=KeyframeConfig(new_node_distance=0.0, new_node_angle_deg=0.0),
        estimation=EdgeEstimationConfig(min_consensus=8, min_matching_score=6.0),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=10, odom_drift=0.05, length=4.0,
    )
    return cfg, world, frames


def _run(cfg, world, frames, retune=None):
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 10 ** 9
    if retune:
        for k, v in retune.items():
            slam.set_param(k, v)
    for fr in frames:
        slam.add_frame(
            np.asarray(fr["image"]), np.asarray(fr["depth"]),
            np.asarray(fr["odom_pose"]), float(fr["stamp"]),
        )
    return slam


class TestTunables:
    def test_defaults_match_config(self, sim):
        cfg, *_ = sim
        tn = tunables_from_config(cfg)
        assert float(tn.min_consensus) == cfg.estimation.min_consensus
        assert float(tn.fast_threshold) == cfg.frontend.fast_threshold

    def test_retune_changes_behavior(self, sim):
        cfg, world, frames = sim
        base = _run(cfg, world, frames)
        # impossibly strict gates: no visual closure can be accepted
        strict = _run(cfg, world, frames, retune={
            "min_matching_score": 1e9, "min_consensus": 1e9,
        })
        n_base = int(jax.device_get(base.state.graph.num_edges))
        n_strict = int(jax.device_get(strict.state.graph.num_edges))
        assert n_strict < n_base

    def test_retune_does_not_recompile(self, sim):
        cfg, world, frames = sim
        slam = _run(cfg, world, frames)
        n_compiles = pipeline.process_keyframe._cache_size()
        slam.set_param("min_matching_score", 42.0)
        slam.set_param("fast_threshold", 11.0)
        slam.set_param("ransac_inlier_thresh", 0.2)
        for fr in frames[:3]:
            slam.add_frame(
                np.asarray(fr["image"]), np.asarray(fr["depth"]),
                np.asarray(fr["odom_pose"]), float(fr["stamp"]) + 100.0,
            )
        assert pipeline.process_keyframe._cache_size() == n_compiles
        assert float(slam.state.tunables.min_matching_score) == 42.0

    def test_keyframe_gate_retunes_host_side(self, sim):
        cfg, world, frames = sim
        slam = pipeline.Slam(
            cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic()
        )
        slam.set_param("new_node_distance", 123.0)
        assert slam.config.keyframe.new_node_distance == 123.0

    def test_unknown_param_raises(self, sim):
        cfg, world, _ = sim
        slam = pipeline.Slam(cfg, cam=world.cam)
        with pytest.raises(KeyError):
            slam.set_param("node_capacity", 1024)
