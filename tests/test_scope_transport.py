"""Scope protocol across a REAL process boundary (VERDICT r4 #5).

The reference's flagship topology is two OS processes exchanging graph
deltas over ROS topics (``iti_slam_launch/launch/slam.launch:1-22``).
Here the GLOBAL role runs in a child process: ``GraphDelta`` / ``Ack`` /
``ScopeReply`` pytrees are serialized (length-prefixed pickle of host
numpy arrays — the transport is the caller's choice) over stdin/stdout
pipes, and the child executes the SAME ``runner.global_exchange_step``
the in-process runner uses.  The resulting global trajectory must match
an in-process ``LocalGlobalSlam`` run on identical frames — proving the
protocol carries everything the global needs with no hidden same-process
state.
"""

import os
import pickle
import struct
import subprocess
import sys

import jax
import numpy as np
import pytest

from uzliti_slam_tpu import runner
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig, KeyframeConfig, ScopeConfig, SlamConfig,
)
from uzliti_slam_tpu.io import simulator

WORKER = r"""
import os, pickle, struct, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ.get("UZSLAM_TEST_CACHE_DIR", "/tmp/uzliti_slam_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import numpy as np

from uzliti_slam_tpu import pipeline, runner

inp = sys.stdin.buffer
out = sys.stdout.buffer

def recv():
    hdr = inp.read(8)
    if len(hdr) < 8:
        return None
    (n,) = struct.unpack("<Q", hdr)
    return pickle.loads(inp.read(n))

def send(obj):
    blob = pickle.dumps(jax.device_get(obj))
    out.write(struct.pack("<Q", len(blob)))
    out.write(blob)
    out.flush()

msg = recv()
assert msg["type"] == "init"
gslam = pipeline.Slam(msg["config"], cam=msg["cam"], cam_pose=msg["cam_pose"])
send({"ok": True})

while True:
    msg = recv()
    if msg is None or msg["type"] == "finish":
        g = gslam.state.graph
        n = int(jax.device_get(g.num_nodes))
        valid = np.asarray(g.node_valid[:n])
        send({
            "poses": np.asarray(g.pose[:n])[valid],
            "uids": np.asarray(g.node_uid[:n])[valid],
            "stamps": np.asarray(g.stamp[:n])[valid],
            "odom_params": np.asarray(g.odom_params),
        })
        break
    ack, reply, info = runner.global_exchange_step(
        gslam, msg["delta"], msg["robot"], msg["radius"],
        msg["delta_nodes"], msg["delta_edges"],
    )
    send({"ack": ack, "reply": reply, "info": info})
"""


def _send(proc, obj):
    blob = pickle.dumps(jax.device_get(obj))
    proc.stdin.write(struct.pack("<Q", len(blob)))
    proc.stdin.write(blob)
    proc.stdin.flush()


def _recv(proc):
    hdr = proc.stdout.read(8)
    assert len(hdr) == 8, "worker died: " + proc.stderr.read().decode()[-3000:]
    (n,) = struct.unpack("<Q", hdr)
    return pickle.loads(proc.stdout.read(n))


@pytest.mark.slow
def test_scope_protocol_across_process_boundary(tmp_path):
    cfg = SlamConfig(
        node_capacity=64, edge_capacity=256, feats_per_node=64, scan_bins=90,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=8, min_matching_score=6.0),
        scope=ScopeConfig(scope_size_min=2.0, eviction_margin=0.5),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=18, odom_drift=0.05, length=5.0,
    )
    cam_pose = simulator.cam_extrinsic()

    # --- in-process reference run on identical frames ---
    ref = runner.LocalGlobalSlam(cfg, cam=world.cam, cam_pose=cam_pose)
    ref.local.optimize_every = 10 ** 9
    for i, fr in enumerate(frames):
        ref.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if (i + 1) % 6 == 0:
            ref.exchange()
    ref.exchange()
    ref_poses, ref_uids, _ = ref.global_trajectory()

    # --- cross-process run: local HERE, global in a child process ---
    wfile = tmp_path / "global_worker.py"
    wfile.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, str(wfile)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        env=env,
    )
    try:
        duo = runner.LocalGlobalSlam(cfg, cam=world.cam, cam_pose=cam_pose)
        duo.local.optimize_every = 10 ** 9
        _send(proc, {
            "type": "init", "config": duo.global_slam.config,
            "cam": world.cam, "cam_pose": cam_pose,
        })
        assert _recv(proc)["ok"]

        def exchange_over_pipe():
            delta, robot, radius = duo.local_make_request()
            _send(proc, {
                "type": "exchange", "delta": delta, "robot": robot,
                "radius": radius, "delta_nodes": duo.delta_nodes,
                "delta_edges": duo.delta_edges,
            })
            resp = _recv(proc)
            duo.local_apply_response(resp["ack"], resp["reply"])

        for i, fr in enumerate(frames):
            duo.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
            if (i + 1) % 6 == 0:
                exchange_over_pipe()
        exchange_over_pipe()

        _send(proc, {"type": "finish"})
        final = _recv(proc)
    finally:
        proc.kill()

    # every keyframe reached the remote global
    kf_uids = final["uids"][final["uids"] < 1_000_000]
    assert len(kf_uids) == duo.local._n_kf_host
    # the remote-global trajectory matches the in-process run node-by-node
    # (identical math on both sides of the pipe; tolerance covers
    # accumulation-order noise only)
    ref_by_uid = {int(u): ref_poses[i] for i, u in enumerate(ref_uids)}
    matched = 0
    for i, u in enumerate(final["uids"]):
        if int(u) in ref_by_uid:
            np.testing.assert_allclose(
                final["poses"][i], ref_by_uid[int(u)], atol=1e-3,
            )
            matched += 1
    assert matched == len(ref_uids) == len(final["uids"])
