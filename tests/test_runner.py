"""Dual-instance local/global runner (VERDICT r1 #8): two live SLAM
instances + the full scope protocol as one loop — the reference's
``slam.launch:1-22`` topology (``graph_slam_node.cpp:356-663``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import runner
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig, KeyframeConfig, ScopeConfig, SlamConfig,
)
from uzliti_slam_tpu.io import simulator, synthetic


@pytest.fixture(scope="module")
def duo_run():
    cfg = SlamConfig(
        node_capacity=64, edge_capacity=256, feats_per_node=64, scan_bins=90,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=8, min_matching_score=6.0),
        scope=ScopeConfig(scope_size_min=2.0, eviction_margin=0.5),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=24, odom_drift=0.05, length=5.0,
    )
    duo = runner.LocalGlobalSlam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    duo.local.optimize_every = 10 ** 9
    evicted = proposed = 0
    for i, fr in enumerate(frames):
        duo.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if (i + 1) % 6 == 0:
            ex = duo.exchange()
            evicted += ex["evicted_local"]
            proposed += ex["proposed_global"]
    for _ in range(4):
        ex = duo.exchange()
        evicted += ex["evicted_local"]
        proposed += ex["proposed_global"]
    return duo, frames, evicted, proposed


@pytest.mark.slow
class TestLocalGlobal:
    def test_all_keyframes_reach_global(self, duo_run):
        duo, frames, *_ = duo_run
        poses, uids, stamps = duo.global_trajectory()
        # every keyframe the local created is in the global map (by uid);
        # the local may have evicted many of them
        n_kf = duo.local._n_kf_host
        kf_uids = uids[uids < 1_000_000]
        assert len(kf_uids) == n_kf
        assert len(np.unique(kf_uids)) == n_kf

    def test_local_window_bounded_by_eviction(self, duo_run):
        duo, frames, evicted, _ = duo_run
        n_live_local = int(np.asarray(duo.local.state.graph.node_valid).sum())
        n_global = len(duo.global_trajectory()[0])
        assert evicted > 0, "scope eviction never fired"
        assert n_live_local < n_global

    def test_global_map_consistent_after_loop(self, duo_run):
        duo, frames, *_ = duo_run
        poses, uids, stamps = duo.global_trajectory()
        kf = uids < 1_000_000
        gt = jnp.stack([frames[int(s)]["gt_pose"] for s in stamps[kf].astype(int)])
        ate = float(synthetic.ate_rmse(jnp.asarray(poses[kf]), gt))
        assert ate < 0.3

    def test_boundary_nodes_fixed_in_local(self, duo_run):
        duo, frames, *_ = duo_run
        g = duo.local.state.graph
        fixed = np.asarray(g.node_fixed) & np.asarray(g.node_valid)
        # the scope replies froze at least one boundary anchor locally
        assert fixed.sum() >= 1

    def test_global_proposes_closures_from_shipped_features(self, duo_run):
        """VERDICT r3 #5 acceptance: the GLOBAL instance runs PR on
        received sensor payloads and proposes loop-closure edges itself
        (the reference re-runs PR on receipt, graph_slam_node.cpp:473-476)."""
        from uzliti_slam_tpu.graph import state as gstate
        duo, frames, _, proposed = duo_run
        assert proposed > 0, "global never proposed a closure from shipped features"
        g = duo.global_slam.state.graph
        ne = int(g.num_edges)
        lc = np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_FULL
        assert lc.sum() > 0

    def test_global_banks_carry_shipped_payloads(self, duo_run):
        duo, *_ = duo_run
        st = duo.global_slam.state
        live = np.asarray(st.graph.node_valid)
        # descriptors and scans arrived for (nearly) every live node
        has_desc = np.asarray(st.desc_valid.any(axis=-1)) & live
        has_scan = np.asarray(st.scan_valid) & live
        assert has_desc.sum() >= 0.9 * live.sum()
        assert has_scan.sum() >= 0.9 * live.sum()

    def test_global_builds_occupancy_map(self, duo_run):
        """Shipped scans make a real global occupancy map possible."""
        duo, *_ = duo_run
        duo.global_slam.project_map(force_full=True)
        tern = np.asarray(duo.global_slam.map_ternary())
        assert (tern == 100).sum() > 10
        assert (tern == 0).sum() > 100

    def test_resend_until_ack_drains(self, duo_run):
        duo, frames, *_ = duo_run
        from uzliti_slam_tpu.parallel import scope
        # after the drain loop, nothing valid is left un-ACKed
        delta = scope.make_delta(
            duo.local.state.graph, duo.ship, duo.local.state.gist.desc
        )
        assert int(jnp.sum(delta.n_uid >= 0)) == 0
