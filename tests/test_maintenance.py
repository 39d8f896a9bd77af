"""Pipeline maintenance steps: scan re-registration, merge/evict epochs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import (
    EdgeEstimationConfig,
    KeyframeConfig,
    ScopeConfig,
    SlamConfig,
)
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import simulator


def run_slam(cfg, n_frames=20, length=4.0):
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(world, n_frames=n_frames, odom_drift=0.03, length=length)
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 10**9
    for fr in frames:
        slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
    return slam


BASE = SlamConfig(
    node_capacity=64, edge_capacity=256, feats_per_node=96, scan_bins=180,
    keyframe=KeyframeConfig(new_node_distance=0.25),
    estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
)


class TestScanReregistration:
    def test_adds_laser_edges_to_nearby_nodes(self):
        slam = run_slam(BASE)
        ne_before = int(slam.state.graph.num_edges)
        n = int(slam.reregister_scans())
        ne_after = int(slam.state.graph.num_edges)
        assert n >= 1
        assert ne_after == ne_before + n
        # new edges are laser type ending at the newest node, and enter
        # INVALID until the cluster filter corroborates them (the reference
        # routes all non-odometry edges through TransformationFilter,
        # g2o_optimizer.cpp:75-103)
        g = slam.state.graph
        newest = int(g.num_nodes) - 1
        new_edges = range(ne_before, ne_after)
        for e in new_edges:
            assert int(g.e_type[e]) == gstate.EDGE_TYPE_2D_LASER
            assert not bool(g.e_valid[e])
            assert int(g.e_to[e]) == newest

    def test_still_optimizes_after(self):
        slam = run_slam(BASE)
        slam.reregister_scans()
        stats = slam.optimize()
        assert np.isfinite(float(stats.chi2_history[-1]))


class TestMaintenance:
    def test_local_role_evicts(self):
        cfg = dataclasses.replace(
            BASE, scope=ScopeConfig(is_sub_graph=True, scope_size_min=1.0,
                                    eviction_margin=0.5),
        )
        slam = run_slam(cfg, n_frames=24, length=5.0)
        nv_before = int(slam.state.graph.node_valid.sum())
        info = slam.maintain()
        evicted = int(info["evicted"])
        assert evicted > 0
        assert int(slam.state.graph.node_valid.sum()) == nv_before - evicted
        # banks follow
        assert int(slam.state.gist.valid.sum()) <= nv_before - evicted + 1

    def test_global_role_merges(self):
        cfg = dataclasses.replace(
            BASE,
            scope=ScopeConfig(merge_nodes=True, scope_size_min=0.5,
                              merge_margin=0.0, merge_dist=0.3,
                              merge_angle_deg=20.0),
            keyframe=KeyframeConfig(new_node_distance=0.05),
        )
        # out-and-back: return leg nodes overlap outgoing nodes spatially
        slam = run_slam(cfg, n_frames=30, length=2.0)
        info = slam.maintain()
        assert int(info["merged"]) > 0
        g = slam.state.graph
        ev = np.asarray(g.e_valid)
        ef = np.asarray(g.e_from)[ev]
        et = np.asarray(g.e_to)[ev]
        nv = np.asarray(g.node_valid)
        assert np.all(nv[ef]) and np.all(nv[et])

    def test_noop_roles(self):
        slam = run_slam(BASE, n_frames=8)
        info = slam.maintain()
        assert int(info["merged"]) == 0 and int(info["evicted"]) == 0


class TestMergeSensorData:
    """Missing r1 #6: node merging must MERGE sensor payloads into the
    kept node, not discard the absorbed node's banks
    (reference graph_slam_node.cpp:890-1062)."""

    def _two_node_state(self):
        import jax.numpy as jnp

        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import ScopeConfig, SlamConfig
        from uzliti_slam_tpu.ops import lie

        cfg = SlamConfig(
            node_capacity=16, edge_capacity=64, feats_per_node=8, scan_bins=8,
            scope=ScopeConfig(merge_nodes=True, scope_size_min=0.5,
                              merge_margin=0.0, merge_dist=0.3),
        )
        st = pipeline.init_state(cfg)
        g = st.graph
        # two nearly-coincident nodes far from the robot center, plus a
        # current keyframe node at the origin to center the scope
        p = lambda x, y: lie.make_pose(jnp.array([x, y, 0.0]), jnp.array([1.0, 0, 0, 0]))
        g, a = gstate.add_node(g, p(5.0, 0.0), p(5.0, 0.0), jnp.asarray(0.0), uid=0)
        g, b = gstate.add_node(g, p(5.05, 0.0), p(5.05, 0.0), jnp.asarray(1.0), uid=1)
        g, c = gstate.add_node(g, p(0.0, 0.0), p(0.0, 0.0), jnp.asarray(2.0), uid=2)
        st = st._replace(graph=g, last_kf_slot=jnp.asarray(int(c), jnp.int32))

        # node a: scan hit only in bin 0 direction; descriptors 0-3 valid
        # node b: scan hit only in the opposite bearing; descriptors 4-7
        scans = st.scans
        scans = scans.at[int(a)].set(jnp.inf).at[int(a), 4].set(2.0)
        scans = scans.at[int(b)].set(jnp.inf).at[int(b), 0].set(1.5)
        dv = st.desc_valid
        dv = dv.at[int(a), :4].set(True)
        dv = dv.at[int(b), 4:].set(True)
        desc = st.desc
        desc = desc.at[int(a)].set(7)
        desc = desc.at[int(b)].set(9)
        st = st._replace(
            scans=scans,
            scan_valid=st.scan_valid.at[int(a)].set(True).at[int(b)].set(True),
            desc=desc,
            desc_valid=dv,
            points=st.points.at[int(b)].set(1.0),
        )
        return pipeline, cfg, st, int(a), int(b)

    def test_scan_and_descriptors_merge_into_kept(self):
        pipeline, cfg, st, a, b = self._two_node_state()
        st2, info = pipeline.maintenance_epoch(st, cfg)
        assert int(info["merged"]) == 1
        g = st2.graph
        # kept = older node (a); absorbed = b
        assert bool(g.node_valid[a])
        assert not bool(g.node_valid[b])
        # descriptor slots backfilled: all 8 slots now valid, mixing both
        dv = np.asarray(st2.desc_valid[a])
        assert dv.sum() == 8
        d = np.asarray(st2.desc[a])
        assert (d == 7).any() and (d == 9).any()
        # merged scan covers BOTH nodes' bearings
        sc = np.asarray(st2.scans[a])
        assert np.isfinite(sc).sum() >= 2
        assert bool(st2.scan_valid[a])
