"""Loop-closure filter + shortest-path tests (SURVEY.md §7 phase 7)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import filter as gfilter
from uzliti_slam_tpu.graph import shortest_path, solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


class TestShortestPath:
    def test_chain_distance(self):
        g, gt = synthetic.make_pose_graph(KEY, 20, odom_noise=0.0, rot_noise=0.0)
        d0 = jnp.full((g.node_capacity,), shortest_path.INF).at[0].set(0.0)
        dist = np.asarray(shortest_path.shortest_paths(g, d0))
        # distance along the chain = cumulative Euclidean step lengths
        pts = np.asarray(lie.pose_t(gt))
        steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        expect = np.concatenate([[0], np.cumsum(steps)])
        np.testing.assert_allclose(dist[:20], expect, rtol=1e-3, atol=1e-3)

    def test_unreachable(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g = g._replace(e_valid=g.e_valid.at[9].set(False))
        d0 = jnp.full((g.node_capacity,), shortest_path.INF).at[0].set(0.0)
        dist = np.asarray(shortest_path.shortest_paths(g, d0))
        assert np.all(dist[10:20] >= 1e37)

    def test_pairwise(self):
        g, _ = synthetic.make_pose_graph(KEY, 30, odom_noise=0.0, rot_noise=0.0)
        src = jnp.array([0, 5], dtype=jnp.int32)
        tgt = jnp.array([10, 6], dtype=jnp.int32)
        d = np.asarray(shortest_path.pairwise_graph_distance(g, src, tgt))
        assert d[0] > d[1] > 0

    def test_uncertainty(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g2 = shortest_path.reevaluate_uncertainty(g)
        unc = np.asarray(g2.uncertainty[:20])
        assert unc[0] == 0.0
        assert np.all(np.diff(unc) > 0)  # monotone along the chain


class TestEdgeHeuristic:
    def test_consistent_edge_accepted(self):
        # radius 2 -> ~0.5 m keyframe spacing, the regime the reference's
        # heuristic constants assume (0.3 m keyframes, GraphSlam.cfg:9)
        g, _ = synthetic.make_pose_graph(KEY, 50, loop_closure_every=10, radius=2.0)
        cf = jnp.array([0], dtype=jnp.int32)
        ct = jnp.array([1], dtype=jnp.int32)
        ok = gfilter.edge_heuristic(g, cf, ct)
        assert bool(ok[0])

    def test_implausible_edge_rejected(self):
        g, _ = synthetic.make_pose_graph(KEY, 50)
        # teleport node 40 far away: an edge 0->40 now claims a pose
        # discrepancy far larger than the graph path can explain
        g = g._replace(pose=g.pose.at[40, 0].add(500.0))
        ok = gfilter.edge_heuristic(
            g, jnp.array([0], dtype=jnp.int32), jnp.array([40], dtype=jnp.int32)
        )
        assert not bool(ok[0])

    def test_unreachable_accepted(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g = g._replace(e_valid=g.e_valid.at[9].set(False))
        ok = gfilter.edge_heuristic(
            g, jnp.array([0], dtype=jnp.int32), jnp.array([15], dtype=jnp.int32)
        )
        assert bool(ok[0])


def _graph_with_loop_closures(n=60, period=20, bad=()):
    """Chain graph + loop closures every node to node+period; indices in
    ``bad`` get a corrupted transform."""
    g, gt = synthetic.make_pose_graph(
        KEY, n, odom_noise=0.01, rot_noise=0.002, loop_closure_every=1,
        edge_capacity=256,
    )
    # make_pose_graph already added closures (i, i+period) for loops=2
    ne = int(g.num_edges)
    lc = np.where(np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_3D_FULL)[0]
    eT = g.e_transform
    for k, e in enumerate(lc):
        if k in bad:
            eT = eT.at[e].set(
                lie.make_pose(
                    jnp.asarray(np.random.default_rng(k).normal(0, 5, 3), jnp.float32),
                    jnp.array([1.0, 0, 0, 0]),
                )
            )
    g = g._replace(e_transform=eT)
    # scores: good edges high, bad low-ish noise
    return g, lc


class TestClusterFilter:
    def test_outliers_invalidated_inliers_kept(self):
        g, lc = _graph_with_loop_closures(bad=(3, 7))
        cand = jnp.asarray(np.pad(lc, (0, 64 - len(lc)), constant_values=-1), jnp.int32)
        keep = np.asarray(gfilter.filter_loop_closures(g, cand, jax.random.PRNGKey(1)))
        present = np.asarray(cand) >= 0
        kept_idx = {int(c) for c, k in zip(np.asarray(cand)[present], keep[present]) if k}
        assert int(lc[3]) not in kept_idx
        assert int(lc[7]) not in kept_idx
        # majority of good closures survive
        good = [int(e) for k, e in enumerate(lc) if k not in (3, 7)]
        assert len(kept_idx & set(good)) >= len(good) * 0.6

    def test_small_cluster_contributes_nothing(self):
        g, lc = _graph_with_loop_closures()
        # only 3 candidates -> below min_cluster_size: conservative reject
        # (reference: edges default invalid, only the cluster-RANSAC
        # whitelist reaches the optimizer, slam_edge.cpp:47)
        cand = jnp.asarray(
            np.pad(lc[:3], (0, 16 - 3), constant_values=-1), jnp.int32
        )
        cfg = gfilter.FilterConfig(min_cluster_size=5)
        keep = np.asarray(gfilter.filter_loop_closures(g, cand, jax.random.PRNGKey(1), cfg))
        assert not keep.any()

    def test_apply_filter_end_to_end(self):
        g, lc = _graph_with_loop_closures(bad=(5,))
        g2 = gfilter.apply_filter(g, jax.random.PRNGKey(2), max_candidates=64)
        ev = np.asarray(g2.e_valid)
        assert not ev[int(lc[5])]
        # odometry untouched
        ne = int(g.num_edges)
        odo = np.asarray(g.e_type[:ne]) == gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY
        np.testing.assert_array_equal(ev[:ne][odo], np.ones(odo.sum(), bool))

    def test_filtered_graph_optimizes_clean(self):
        g, lc = _graph_with_loop_closures(bad=(2, 9))
        gt = synthetic.circle_trajectory(60)
        g_filtered = gfilter.apply_filter(g, jax.random.PRNGKey(3), max_candidates=64)
        g_opt, _ = solver.optimize(g_filtered, solver.SolverConfig(iterations=15))
        ate = float(synthetic.ate_rmse(g_opt.pose[:60], gt))
        # unfiltered for comparison
        g_bad, _ = solver.optimize(g, solver.SolverConfig(iterations=15))
        ate_bad = float(synthetic.ate_rmse(g_bad.pose[:60], gt))
        assert ate < 0.1
        assert ate < ate_bad
