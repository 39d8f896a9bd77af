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
