"""Regression tests for the code-review findings (filter windowing, dedup
semantics, bank hygiene, growth, delta dedup)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import EdgeEstimationConfig, KeyframeConfig, SlamConfig
from uzliti_slam_tpu.graph import filter as gfilter
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import simulator, synthetic
from uzliti_slam_tpu.ops import lie, ransac
from uzliti_slam_tpu.parallel import scope

KEY = jax.random.PRNGKey(0)


class TestRecentCandidates:
    def test_tail_selected(self):
        mask = jnp.zeros(100, bool).at[jnp.arange(0, 100, 2)].set(True)  # 50 True
        idx = np.asarray(gfilter.recent_candidates(mask, 10))
        assert (idx >= 0).all()
        # the ten most recent true slots: 80, 82, ..., 98
        np.testing.assert_array_equal(sorted(idx), np.arange(80, 100, 2))

    def test_fewer_than_window(self):
        mask = jnp.zeros(50, bool).at[3].set(True).at[7].set(True)
        idx = np.asarray(gfilter.recent_candidates(mask, 8))
        assert set(idx[idx >= 0]) == {3, 7}


class TestSparseClusterRansac:
    def test_scattered_cluster_validated(self):
        """A consistent cluster living at HIGH candidate indices must be
        findable (the old progressive sampler almost never reached it)."""
        m = 256
        true_pose = lie.se3_exp(jnp.array([0.2, -0.1, 0.1, 0.05, -0.05, 0.1]))
        src = 2.0 * jax.random.normal(KEY, (m, 3))
        dst = lie.pose_apply(true_pose[None], src)
        valid = jnp.zeros(m, bool).at[jnp.arange(200, 212)].set(True)  # 12 pts at tail
        res = ransac.ransac_rigid(
            jax.random.PRNGKey(1), src, dst, valid,
            n_hypotheses=128, inlier_thresh=0.05, min_consensus=8,
        )
        assert bool(res.ok)
        dt, _ = lie.pose_distance(res.pose, true_pose)
        assert float(dt) < 0.02


class TestFilterDeadEndpoints:
    @pytest.mark.slow
    def test_edge_to_invalid_node_never_validated(self):
        g, _ = synthetic.make_pose_graph(KEY, 60, loop_closure_every=1,
                                         edge_capacity=256)
        ne = int(g.num_edges)
        lc = np.where(np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_FULL)[0]
        # kill the endpoint node of one closure
        victim_edge = int(lc[4])
        victim_node = int(g.e_to[victim_edge])
        g = g._replace(node_valid=g.node_valid.at[victim_node].set(False))
        cand = jnp.asarray(np.pad(lc, (0, 64 - len(lc)), constant_values=-1), jnp.int32)
        keep = np.asarray(gfilter.filter_loop_closures(g, cand, jax.random.PRNGKey(2)))
        pos = list(lc).index(victim_edge)
        assert not keep[pos]


class TestCandidateDedup:
    @pytest.mark.slow
    def test_invalid_padding_does_not_shadow(self):
        """An earlier INVALID duplicate slot must not suppress a later valid
        candidate (the top_k -inf padding pattern)."""
        # exercised through process_keyframe by constructing a scenario
        # with zero PR hits (padding slots 0..k-1 invalid) and a distance
        # candidate at slot 0 — the sequence revisits its start.
        cfg = SlamConfig(
            node_capacity=32, edge_capacity=128, feats_per_node=64, scan_bins=90,
            keyframe=KeyframeConfig(new_node_distance=0.1, distance_closure_radius=3.0),
            estimation=EdgeEstimationConfig(min_consensus=6, min_matching_score=4.0),
            recognition=dataclasses.replace(
                SlamConfig().recognition, gist_max_dist=-1.0,  # PR never fires
            ),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=16, odom_drift=0.01, length=1.6)
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10**9
        for fr in frames:
            info = slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        # return leg: distance candidates to early nodes (incl. slot 0) must
        # produce proposed edges despite PR padding carrying slot 0
        g = slam.state.graph
        ne = int(g.num_edges)
        lc = np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_FULL
        lc_to_first = lc & (np.asarray(g.e_from[:ne]) == 0)
        assert lc_to_first.sum() >= 1


class TestAutoGrowth:
    def test_capacity_doubles_and_keyframes_survive(self):
        cfg = SlamConfig(
            node_capacity=8, edge_capacity=32, feats_per_node=64, scan_bins=90,
            keyframe=KeyframeConfig(new_node_distance=0.05),
            estimation=EdgeEstimationConfig(min_consensus=6, min_matching_score=4.0),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=14, odom_drift=0.01, length=2.0)
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10**9
        for fr in frames:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        assert slam.config.node_capacity >= 16   # grew past the initial 8
        # every keyframe the gate accepted made it into the graph (the
        # turn-around frame repeats a position and is legitimately skipped)
        assert int(slam.state.graph.num_nodes) == slam._n_kf_host >= 12
        assert slam.state.desc.shape[0] == slam.config.node_capacity


class TestReregistrationDedup:
    @pytest.mark.slow
    def test_repeated_calls_do_not_duplicate(self):
        cfg = SlamConfig(
            node_capacity=32, edge_capacity=128, feats_per_node=64, scan_bins=180,
            keyframe=KeyframeConfig(new_node_distance=0.2),
            estimation=EdgeEstimationConfig(min_consensus=6, min_matching_score=4.0),
        )
        world = simulator.WallWorld(img_h=96, img_w=128)
        frames = simulator.simulate_sequence(world, n_frames=12, odom_drift=0.02, length=2.5)
        slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
        slam.optimize_every = 10**9
        for fr in frames:
            slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        n1 = int(slam.reregister_scans())
        ne_after_first = int(slam.state.graph.num_edges)
        n2 = int(slam.reregister_scans())  # same robot position: all dupes
        assert n2 == 0
        assert int(slam.state.graph.num_edges) == ne_after_first


class TestDeltaIntraDedup:
    def test_duplicate_edges_in_one_delta(self):
        g, _ = synthetic.make_pose_graph(KEY, 6, node_capacity=16, edge_capacity=32)
        gists = jnp.zeros((16, 32), dtype=jnp.uint8)
        ship = scope.ship_state_init(g)
        delta = scope.make_delta(g, ship, gists, max_nodes=8, max_edges=16)
        # duplicate the first edge record inside the delta
        delta = delta._replace(
            e_from_uid=delta.e_from_uid.at[6].set(delta.e_from_uid[0]),
            e_to_uid=delta.e_to_uid.at[6].set(delta.e_to_uid[0]),
            e_type=delta.e_type.at[6].set(delta.e_type[0]),
            e_transform=delta.e_transform.at[6].set(delta.e_transform[0]),
            e_valid=delta.e_valid.at[6].set(True),
        )
        glob = gstate.empty_graph(32, 64)
        glob, _ = scope.apply_delta(glob, delta)
        assert int(glob.num_edges) == 5  # 5 odometry edges, dup skipped


class TestTridiagPaddingBug:
    def test_nonpow2_last_U_ignored(self):
        """U[n-1] must be ignored for ANY n (the old code only zeroed the
        padded last index, letting U[n-1] couple into the padding)."""
        from uzliti_slam_tpu.graph import tridiag
        n = 5
        k = jax.random.PRNGKey(0)
        Ah = jax.random.normal(k, (n, 6, 6)) * 0.3
        D = jnp.einsum("nij,nkj->nik", Ah, Ah) + 4.0 * jnp.eye(6)
        U = jax.random.normal(jax.random.PRNGKey(1), (n, 6, 6)) * 0.3  # U[4] != 0
        b = jax.random.normal(jax.random.PRNGKey(2), (n, 6))
        x = tridiag.block_tridiag_solve(D, U, b)
        x_ref = tridiag.block_tridiag_solve(D, U.at[n - 1].set(0.0), b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)

    def test_factor_apply_matches_solve(self):
        from uzliti_slam_tpu.graph import tridiag
        n = 13
        k = jax.random.PRNGKey(3)
        Ah = jax.random.normal(k, (n, 6, 6)) * 0.3
        D = jnp.einsum("nij,nkj->nik", Ah, Ah) + 4.0 * jnp.eye(6)
        U = (jax.random.normal(jax.random.PRNGKey(4), (n, 6, 6)) * 0.3).at[n - 1].set(0.0)
        fac = tridiag.block_tridiag_factor(D, U)
        for seed in (5, 6):
            b = jax.random.normal(jax.random.PRNGKey(seed), (n, 6))
            np.testing.assert_allclose(
                np.asarray(tridiag.block_tridiag_apply(fac, b)),
                np.asarray(tridiag.block_tridiag_solve(D, U, b)),
                atol=1e-5,
            )


class TestDetectExactK:
    @pytest.mark.slow
    def test_k_contract_any_levels(self):
        from uzliti_slam_tpu.ops import features
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (128, 160)).astype(np.float32))
        for k, lv in [(50, 4), (100, 3), (17, 4)]:
            kps, desc = features.detect_and_describe(img, max_keypoints=k, n_levels=lv)
            assert desc.shape == (k, 32)
            assert kps.uv.shape == (k, 2)


class TestThirdBatchFixes:
    def test_pnp_dlt_clean_scenes(self):
        """DLT must recover pose on clean 6-point scenes (was ~35% failure
        from the SVD sign / reflection bug)."""
        from uzliti_slam_tpu.ops import pnp
        fails = 0
        total = 0
        for seed in range(20):
            k = jax.random.PRNGKey(seed)
            k1, k2, k3 = jax.random.split(k, 3)
            tp = lie.se3_exp(0.3 * jax.random.normal(k1, (6,)))
            X = jnp.concatenate(
                [jax.random.uniform(k2, (6, 2), minval=-2, maxval=2),
                 jax.random.uniform(k3, (6, 1), minval=3.0, maxval=8.0)], -1)
            Xc = lie.pose_apply(tp[None], X)
            if float(Xc[:, 2].min()) < 0.2:
                continue
            total += 1
            xn = Xc[:, :2] / Xc[:, 2:3]
            est = pnp._dlt_pose(X, xn, jnp.ones(6))
            if float(jnp.abs(pnp._project_norm(est, X) - xn).max()) > 1e-3:
                fails += 1
        assert fails == 0 and total >= 10

    def test_occupancy_beyond_max_range_frees(self):
        from uzliti_slam_tpu.mapping import occupancy
        cfg = occupancy.GridConfig(size=128, resolution=0.1, max_range=4.0)
        g = gstate.empty_graph(8, 8)
        p = lie.pose_identity()
        g, _ = gstate.add_node(g, p, p, jnp.asarray(0.0))
        bins = 180
        ang = np.pi * (2 * (np.arange(bins) + 0.5) / bins - 1)
        ranges = np.full(bins, np.inf, np.float32)
        fwd = int(np.argmin(np.abs(ang)))
        # a contiguous 5-bin return, as real/virtual scans produce —
        # the per-cell inverse sensor model reads each cell's OWN bin,
        # so an isolated 2-degree wedge thinner than a cell would
        # legitimately skip near-range cell centers
        ranges[fwd - 2:fwd + 3] = 8.0  # beyond max_range: frees to 4 m

        scans = jnp.zeros((8, bins)).at[0].set(jnp.asarray(ranges))
        sv = jnp.zeros(8, bool).at[0].set(True)
        grid = occupancy.project(occupancy.grid_init(g, cfg), g, scans, sv, cfg)
        lo = np.asarray(grid.logodds)
        c2 = int(np.floor((2.0 - float(grid.origin[0])) / cfg.resolution))
        c5 = int(np.floor((5.0 - float(grid.origin[0])) / cfg.resolution))
        r0 = int(np.floor((0.0 - float(grid.origin[1])) / cfg.resolution))
        rows = slice(r0 - 2, r0 + 3)  # the bin center is slightly off-axis
        assert lo[rows, c2].min() < 0   # free inside max_range
        assert np.all(lo[:, c5:] == 0)  # nothing beyond max_range
        assert lo.max() <= 0.0          # no occupied endpoint anywhere
