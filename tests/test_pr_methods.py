"""Place-recognition method selection in the pipeline — the reference's
``place_recognition_method`` yaml param (gist | lsh/feature_set |
gfr/repository, plus the DBoW2 bow variant)."""

import jax
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig,
    KeyframeConfig,
    PlaceRecognitionConfig,
    SlamConfig,
)
from uzliti_slam_tpu.io import simulator
from uzliti_slam_tpu.ops import features
from uzliti_slam_tpu.recognition import vocabulary as voc


def _cfg(method, **rec_kw):
    return SlamConfig(
        node_capacity=64,
        edge_capacity=256,
        feats_per_node=96,
        scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
        recognition=PlaceRecognitionConfig(method=method, **rec_kw),
    )


@pytest.fixture(scope="module")
def world_frames():
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=30, odom_drift=0.06, length=4.0
    )
    return world, frames


def _run(cfg, world, frames, vocabulary=None):
    slam = pipeline.Slam(
        cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic(),
        vocabulary=vocabulary,
    )
    slam.optimize_every = 10**9
    infos = []
    for fr in frames:
        info = slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if info:
            infos.append(info)
    return slam, infos


def _proposed(infos):
    return sum(int(i["n_edges_proposed"]) for i in infos)


def test_feature_set_method_proposes_closures(world_frames):
    world, frames = world_frames
    cfg = _cfg("feature_set", min_descriptors=20, min_similarity=0.15)
    slam, infos = _run(cfg, world, frames)
    assert _proposed(infos) >= 3


@pytest.mark.slow
def test_repository_method_proposes_closures(world_frames):
    world, frames = world_frames
    cfg = _cfg("repository", repo_min_votes=5, repo_desc_per_node=48)
    slam, infos = _run(cfg, world, frames)
    assert _proposed(infos) >= 3
    assert int(slam.state.repo.num_desc) > 0


@pytest.mark.slow
def test_bow_method_proposes_closures(world_frames):
    world, frames = world_frames
    # train a vocabulary on descriptors from a few frames (the offline
    # generate_bow_vocabulary step)
    descs = []
    for fr in frames[::6]:
        _, d = features.detect_and_describe(fr["image"], max_keypoints=96)
        descs.append(np.asarray(d))
    train = np.concatenate(descs)
    vocab = voc.build_vocabulary(
        jax.random.PRNGKey(0), train, k=64, iterations=6
    )
    cfg = _cfg("bow", bow_words=64, bow_min_score=0.2)
    slam, infos = _run(cfg, world, frames, vocabulary=vocab)
    assert _proposed(infos) >= 3
    assert bool(slam.state.bow.valid.any())


def test_bow_requires_vocabulary(world_frames):
    with pytest.raises(ValueError, match="vocabulary"):
        pipeline.init_state(_cfg("bow"))


def test_unknown_method_rejected(world_frames):
    world, frames = world_frames
    cfg = _cfg("kitchen_sink")
    with pytest.raises(ValueError, match="kitchen_sink"):
        _run(cfg, world, frames[:3])


def test_grow_state_pads_method_banks(world_frames):
    cfg = _cfg("repository")
    st = pipeline.init_state(cfg)
    st2 = pipeline.grow_state(st, cfg.node_capacity * 2, cfg.edge_capacity * 2)
    assert st2.repo.node_valid.shape[0] == cfg.node_capacity * 2
    assert st2.repo.desc.shape == st.repo.desc.shape  # desc bank unchanged

    descs = np.zeros((128, 32), np.uint8)
    vocab = voc.build_vocabulary(jax.random.PRNGKey(1), descs, k=16, iterations=2)
    cfg_b = _cfg("bow", bow_words=16)
    stb = pipeline.init_state(cfg_b, vocabulary=vocab)
    stb2 = pipeline.grow_state(stb, cfg_b.node_capacity * 2, cfg_b.edge_capacity * 2)
    assert stb2.bow.vec.shape[0] == cfg_b.node_capacity * 2
    assert stb2.vocab.centers.shape == (16, 32)
