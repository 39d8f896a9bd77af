"""Chunked frame ingestion (process_frame_chunk) vs per-frame path.

The chunk step is the TPU-native streaming front-end (SURVEY §2.9 P1): one
device dispatch per T frames with the keyframe gate
(graph_slam_node.cpp:161-186) evaluated on-device via lax.cond.
"""

import dataclasses

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
from uzliti_slam_tpu.io import simulator


def _cfg(**kw):
    base = dict(
        node_capacity=64,
        edge_capacity=256,
        feats_per_node=64,
        scan_bins=90,
        keyframe=KeyframeConfig(new_node_distance=0.0, new_node_angle_deg=0.0),
        estimation=EdgeEstimationConfig(min_consensus=8, min_matching_score=6.0),
    )
    base.update(kw)
    return SlamConfig(**base)


@pytest.fixture(scope="module")
def frames():
    world = simulator.WallWorld(img_h=96, img_w=128, f=110.0)
    return world, simulator.simulate_sequence(
        world, n_frames=8, odom_drift=0.02, length=3.0
    )


@pytest.mark.slow
def test_chunk_matches_per_frame(frames):
    world, frs = frames
    imgs = np.stack([f["image"] for f in frs])
    deps = np.stack([f["depth"] for f in frs])
    odos = np.stack([f["odom_pose"] for f in frs])
    stamps = np.array([f["stamp"] for f in frs], np.float32)

    s1 = pipeline.Slam(_cfg(), cam=world.cam, cam_pose=simulator.cam_extrinsic())
    s1.optimize_every = 10**9
    for f in frs:
        s1.add_frame(f["image"], f["depth"], f["odom_pose"], f["stamp"])

    s2 = pipeline.Slam(_cfg(), cam=world.cam, cam_pose=simulator.cam_extrinsic())
    s2.optimize_every = 10**9
    infos = s2.add_frames(imgs, deps, odos, stamps)

    assert bool(np.all(np.asarray(infos["inserted"])))
    g1, g2 = s1.state.graph, s2.state.graph
    assert int(g1.num_nodes) == int(g2.num_nodes) == len(frs)
    assert int(g1.num_edges) == int(g2.num_edges)
    np.testing.assert_allclose(
        np.asarray(g1.pose), np.asarray(g2.pose), atol=1e-5
    )
    assert np.array_equal(np.asarray(g1.e_from), np.asarray(g2.e_from))
    assert np.array_equal(np.asarray(g1.e_type), np.asarray(g2.e_type))


@pytest.mark.slow
def test_chunk_gate_skips_static_frames(frames):
    world, frs = frames
    # repeat the SAME frame: after the first insertion nothing moves, so the
    # on-device gate must skip the rest
    f0 = frs[0]
    imgs = np.stack([f0["image"]] * 5)
    deps = np.stack([f0["depth"]] * 5)
    odos = np.stack([f0["odom_pose"]] * 5)
    stamps = np.arange(5, dtype=np.float32)

    cfg = _cfg(keyframe=KeyframeConfig(new_node_distance=0.3, new_node_angle_deg=10.0))
    s = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    s.optimize_every = 10**9
    infos = s.add_frames(imgs, deps, odos, stamps)
    ins = np.asarray(infos["inserted"])
    assert ins[0] and not ins[1:].any()
    assert int(s.state.graph.num_nodes) == 1
    assert s._n_kf_host == 1


@pytest.mark.slow
def test_chunk_auto_grows(frames):
    world, frs = frames
    imgs = np.stack([f["image"] for f in frs])
    deps = np.stack([f["depth"] for f in frs])
    odos = np.stack([f["odom_pose"] for f in frs])
    stamps = np.array([f["stamp"] for f in frs], np.float32)

    cfg = _cfg(node_capacity=8, edge_capacity=64)
    s = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    s.optimize_every = 10**9
    s.add_frames(imgs, deps, odos, stamps)
    assert s.config.node_capacity >= 16
    assert int(s.state.graph.num_nodes) == len(frs)


class TestEnqueueFrame:
    """Gate-before-transfer streaming (Slam.enqueue_frame) must insert
    exactly the keyframes the per-frame path inserts."""

    def test_matches_add_frame_path(self):
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import (
            EdgeEstimationConfig, KeyframeConfig, SlamConfig,
        )
        from uzliti_slam_tpu.io import simulator

        cfg = SlamConfig(
            node_capacity=32, edge_capacity=128, feats_per_node=32,
            scan_bins=45,
            keyframe=KeyframeConfig(new_node_distance=0.3),
            estimation=EdgeEstimationConfig(min_consensus=8,
                                            min_matching_score=6.0),
        )
        world = simulator.WallWorld(img_h=64, img_w=96)
        frames = simulator.simulate_sequence(
            world, n_frames=14, odom_drift=0.05, length=4.0,
        )

        ref = pipeline.Slam(cfg, cam=world.cam,
                            cam_pose=simulator.cam_extrinsic())
        ref.optimize_every = 10 ** 9
        for fr in frames:
            ref.add_frame(np.asarray(fr["image"]), np.asarray(fr["depth"]),
                          np.asarray(fr["odom_pose"]), float(fr["stamp"]))

        stream = pipeline.Slam(cfg, cam=world.cam,
                               cam_pose=simulator.cam_extrinsic())
        stream.optimize_every = 10 ** 9
        n_due = 0
        for fr in frames:
            n_due += bool(stream.enqueue_frame(
                np.asarray(fr["image"]), np.asarray(fr["depth"]),
                np.asarray(fr["odom_pose"]), float(fr["stamp"]), chunk=4,
            ))
        stream.flush_frames(4)

        assert n_due == ref._n_kf_host == stream._n_kf_host
        g_r, g_s = ref.state.graph, stream.state.graph
        assert int(g_r.num_nodes) == int(g_s.num_nodes)
        # identical keyframe stamps -> identical graphs up to float noise
        np.testing.assert_allclose(
            np.asarray(g_s.stamp), np.asarray(g_r.stamp), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_s.pose), np.asarray(g_r.pose), atol=1e-4
        )

    def test_partial_flush_pads_single_shape(self):
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import KeyframeConfig, SlamConfig
        from uzliti_slam_tpu.io import simulator

        cfg = SlamConfig(
            node_capacity=32, edge_capacity=128, feats_per_node=32,
            scan_bins=45,
            keyframe=KeyframeConfig(new_node_distance=0.0,
                                    new_node_angle_deg=0.0),
        )
        world = simulator.WallWorld(img_h=64, img_w=96)
        frames = simulator.simulate_sequence(
            world, n_frames=6, odom_drift=0.05, length=3.0,
        )
        slam = pipeline.Slam(cfg, cam=world.cam,
                             cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10 ** 9
        for fr in frames[:4]:
            slam.enqueue_frame(np.asarray(fr["image"]), np.asarray(fr["depth"]),
                               np.asarray(fr["odom_pose"]), float(fr["stamp"]),
                               chunk=4)
        compiles = pipeline.process_frame_chunk._cache_size()
        # 2 more frames -> partial buffer, padded flush reuses the shape
        for fr in frames[4:]:
            slam.enqueue_frame(np.asarray(fr["image"]), np.asarray(fr["depth"]),
                               np.asarray(fr["odom_pose"]), float(fr["stamp"]),
                               chunk=4)
        slam.flush_frames(4)
        assert pipeline.process_frame_chunk._cache_size() == compiles
        assert slam._n_kf_host == 6
