"""Solver validation: chi2 descent, ground-truth recovery, dense-reference
parity (SURVEY.md §7 phase 3: 'Validate ATE/chi2 against g2o on replayed
graphs' — here the oracle is a dense numpy Gauss-Newton)."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import factors, solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def dense_gn_reference(g, n_nodes, gauge, iters=10):
    """Dense numpy Gauss-Newton on the same factors — the correctness oracle."""
    poses = np.asarray(g.pose).copy()
    ef = np.asarray(g.e_from)
    et = np.asarray(g.e_to)
    valid_e = np.asarray(g.e_valid)
    info = np.asarray(g.e_info)

    for _ in range(iters):
        jg = jnp.asarray(poses)
        r, Ji, Jj = solver.factors.batched_residual_jacobians(
            jg[g.e_from], jg[g.e_to], g.e_transform
        )
        r, Ji, Jj = np.asarray(r), np.asarray(Ji), np.asarray(Jj)
        H = np.zeros((6 * n_nodes, 6 * n_nodes))
        b = np.zeros(6 * n_nodes)
        for e in range(len(ef)):
            if not valid_e[e]:
                continue
            i, j = ef[e], et[e]
            W = info[e]
            A, B = Ji[e], Jj[e]
            H[6*i:6*i+6, 6*i:6*i+6] += A.T @ W @ A
            H[6*i:6*i+6, 6*j:6*j+6] += A.T @ W @ B
            H[6*j:6*j+6, 6*i:6*i+6] += B.T @ W @ A
            H[6*j:6*j+6, 6*j:6*j+6] += B.T @ W @ B
            b[6*i:6*i+6] += A.T @ W @ r[e]
            b[6*j:6*j+6] += B.T @ W @ r[e]
        free = np.ones(6 * n_nodes, dtype=bool)
        for i in np.where(np.asarray(gauge))[0]:
            free[6*i:6*i+6] = False
        Hf = H[np.ix_(free, free)] + 1e-8 * np.eye(free.sum())
        dx = np.zeros(6 * n_nodes)
        dx[free] = np.linalg.solve(Hf, -b[free])
        poses[:n_nodes] = np.asarray(
            lie.pose_retract(
                jnp.asarray(poses[:n_nodes]), jnp.asarray(dx.reshape(-1, 6))
            )
        )
    return poses


class TestComponents:
    def test_single_chain(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        labels = solver.connected_components(g)
        assert np.all(np.asarray(labels[:20]) == 0)

    def test_two_components(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        # cut the chain in the middle: invalidate edge 9 (connects 9-10)
        g = g._replace(e_valid=g.e_valid.at[9].set(False))
        labels = np.asarray(solver.connected_components(g))
        assert np.all(labels[:10] == 0)
        assert np.all(labels[10:20] == 10)

    def test_gauge_oldest_per_component(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g = g._replace(e_valid=g.e_valid.at[9].set(False))
        labels = solver.connected_components(g)
        gauge = np.asarray(solver.gauge_fix_mask(g, labels))
        assert gauge[0] and gauge[10]
        assert gauge.sum() == 2

    def test_prefixed_respected(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g = g._replace(node_fixed=g.node_fixed.at[5].set(True))
        labels = solver.connected_components(g)
        gauge = np.asarray(solver.gauge_fix_mask(g, labels))
        assert gauge[5] and not gauge[0]
        assert gauge.sum() == 1


class TestSolver:
    def test_chi2_decreases(self):
        g, _ = synthetic.make_pose_graph(KEY, 100, loop_closure_every=10)
        g2, stats = solver.optimize(g, solver.SolverConfig(iterations=10))
        hist = np.asarray(stats.chi2_history)
        assert hist[-1] < 0.1 * hist[0]
        assert np.all(np.isfinite(np.asarray(g2.pose)))

    def test_recovers_ground_truth(self):
        g, gt = synthetic.make_pose_graph(
            KEY, 100, odom_noise=0.05, rot_noise=0.01, loop_closure_every=5
        )
        ate_before = synthetic.ate_rmse(g.pose[:100], gt)
        g2, _ = solver.optimize(
            g, solver.SolverConfig(iterations=20, pcg_iterations=48)
        )
        ate_after = synthetic.ate_rmse(g2.pose[:100], gt)
        assert float(ate_after) < 0.25 * float(ate_before)
        # Noise-floor optimum for this problem is ~0.164 (verified equal to a
        # dense-normal-equations Gauss-Newton oracle).
        assert float(ate_after) < 0.18

    def test_matches_dense_reference(self):
        g, _ = synthetic.make_pose_graph(KEY, 30, loop_closure_every=7)
        labels = solver.connected_components(g)
        gauge = solver.gauge_fix_mask(g, labels)
        ref_poses = dense_gn_reference(g, 30, gauge, iters=8)
        cfg = solver.SolverConfig(iterations=15, pcg_iterations=40, lambda_init=1e-6)
        g2, _ = solver.optimize(g, cfg)
        ref_chi2 = float(solver.total_chi2(g, jnp.asarray(ref_poses), 1.0))
        our_chi2 = float(solver.total_chi2(g, g2.pose, 1.0))
        # PCG+LM should reach the same basin as the dense solve.
        assert our_chi2 <= ref_chi2 * 1.05 + 1e-4
        dt, dr = lie.pose_distance(g2.pose[:30], jnp.asarray(ref_poses)[:30])
        assert float(jnp.max(dt)) < 0.05
        assert float(jnp.max(dr)) < 0.02

    def test_fixed_nodes_do_not_move(self):
        g, _ = synthetic.make_pose_graph(KEY, 50, loop_closure_every=10)
        g = g._replace(node_fixed=g.node_fixed.at[0].set(True))
        p0 = g.pose[0]
        g2, _ = solver.optimize(g)
        np.testing.assert_allclose(np.asarray(g2.pose[0]), np.asarray(p0), atol=1e-7)

    def test_invalid_edges_ignored(self):
        g, _ = synthetic.make_pose_graph(KEY, 30)
        # corrupt an edge but mark it invalid — must not affect result
        bad = g._replace(
            e_transform=g.e_transform.at[5].set(
                lie.make_pose(jnp.array([100.0, 0, 0]), jnp.array([1.0, 0, 0, 0]))
            )
        )
        bad = bad._replace(e_valid=bad.e_valid.at[5].set(False))
        ref = g._replace(e_valid=g.e_valid.at[5].set(False))
        g_bad, _ = solver.optimize(bad)
        g_ref, _ = solver.optimize(ref)
        np.testing.assert_allclose(
            np.asarray(g_bad.pose), np.asarray(g_ref.pose), atol=1e-5
        )

    def test_edge_error_writeback(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g2, _ = solver.optimize(g)
        err = np.asarray(g2.e_error)
        assert np.all(err[:19] >= 0)
        assert np.all(np.asarray(g2.e_age)[:19] == 1.0)
        # padding slots untouched
        assert np.all(err[19:] == 0)

    def test_jit_compiles_once(self):
        g, _ = synthetic.make_pose_graph(KEY, 50, loop_closure_every=10)
        jopt = jax.jit(lambda gr: solver.optimize(gr)[0].pose)
        p1 = jopt(g)
        p2 = jopt(g._replace(pose=g.pose * 1.0))
        assert np.all(np.isfinite(np.asarray(p1)))
        assert p1.shape == p2.shape


class TestFactors:
    def test_zero_residual_at_truth(self):
        k = KEY
        gt = synthetic.circle_trajectory(10)
        meas = lie.pose_relative(gt[:-1], gt[1:])
        r = factors.batched_residuals(gt[:-1], gt[1:], meas)
        np.testing.assert_allclose(np.asarray(r), np.zeros((9, 6)), atol=1e-5)

    def test_jacobian_matches_fd(self):
        pi = lie.se3_exp(0.3 * jax.random.normal(KEY, (6,)))
        pj = lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(1), (6,)))
        meas = lie.se3_exp(0.1 * jax.random.normal(jax.random.PRNGKey(2), (6,)))
        r0, Ji, Jj = factors.edge_residual_jacobians(pi, pj, meas)
        eps = 1e-4
        for k in range(6):
            dv = jnp.zeros(6).at[k].set(eps)
            rp = factors.edge_residual(lie.pose_retract(pi, dv), pj, meas)
            np.testing.assert_allclose(
                np.asarray((rp - r0) / eps), np.asarray(Ji[:, k]), atol=2e-2
            )
            rp = factors.edge_residual(pi, lie.pose_retract(pj, dv), meas)
            np.testing.assert_allclose(
                np.asarray((rp - r0) / eps), np.asarray(Jj[:, k]), atol=2e-2
            )

    def test_huber(self):
        w = factors.huber_weight(jnp.array([0.25, 1.0, 100.0]), delta=1.0)
        np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 0.1], atol=1e-6)

    def test_analytic_jacobians_match_ad_oracle(self):
        """The closed-form Jr⁻¹/adjoint Jacobians must equal the jacfwd
        oracle across small and near-π residual rotations (the Barfoot Q
        term only matters at large angle — a transcription error there is
        invisible to small-perturbation tests)."""
        # all three rotation regimes in ONE batched call (small / mid /
        # near-π rows concatenated) so the AD oracle traces exactly once
        scales = jnp.repeat(jnp.array([0.02, 0.3, 0.9]), 16)[:, None]

        def mk(k):
            return lie.se3_exp(
                jnp.concatenate(
                    [jax.random.normal(k, (48, 3)),
                     scales * jax.random.normal(k, (48, 3))], -1
                )
            )

        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        pi, pj, meas = mk(ks[0]), mk(ks[1]), mk(ks[2])
        r1, Ji1, Jj1 = factors.batched_residual_jacobians(pi, pj, meas)
        r2, Ji2, Jj2 = factors.batched_residual_jacobians_ad(pi, pj, meas)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ji1), np.asarray(Ji2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(Jj1), np.asarray(Jj2), atol=2e-4)


class TestSplitHvp:
    """The dense/sparse split Hv (production hot path at >=4k nodes) must
    equal the full-scatter Hv, including the overflow fallback (ADVICE r3)."""

    def _linearize(self, g):
        from uzliti_slam_tpu.graph import tridiag

        r = factors.batched_residuals(g.pose[g.e_from], g.pose[g.e_to], g.e_transform)
        W = solver._weighted_info(g, r, 1.0)
        adj = jax.vmap(lambda m: lie.se3_adjoint(lie.pose_inverse(m)))(g.e_transform)
        Ji, Jj = factors.jacobians_from_residual(r, adj)
        labels = solver.connected_components(g)
        gauge = solver.gauge_fix_mask(g, labels)
        free = (g.node_valid & ~gauge).astype(g.pose.dtype)
        Hblocks = solver._hessian_diag_blocks(g, Ji, Jj, W)
        U = tridiag.chain_offdiag_blocks(g, Ji, Jj, W, free)
        damp = 1e-3 * jnp.maximum(jax.vmap(jnp.diag)(Hblocks), 1e-6)
        return r, W, Ji, Jj, Hblocks, U, damp, free

    def test_split_matches_full_scatter(self):
        g, _ = synthetic.make_pose_graph(KEY, 64, loop_closure_every=7)
        r, W, Ji, Jj, Hblocks, U, damp, free = self._linearize(g)
        closure = solver.closure_partition(g, 32)  # plenty of room
        split = solver._make_split_hvp(g, Ji, Jj, W, Hblocks, U, closure, damp, free)
        full = solver._make_hvp(g, Ji, Jj, W, damp, free)
        v = jax.random.normal(jax.random.PRNGKey(7), (g.node_capacity, 6))
        np.testing.assert_allclose(
            np.asarray(split(v)), np.asarray(full(v)), rtol=1e-5, atol=1e-5
        )

    def test_overflow_fallback_engages_and_is_exact(self):
        g, _ = synthetic.make_pose_graph(KEY, 64, loop_closure_every=4)
        r, W, Ji, Jj, Hblocks, U, damp, free = self._linearize(g)
        cl = solver.closure_partition(g, 2)  # force n_cl > capacity
        assert int(cl[3]) > 2
        split = solver._make_split_hvp(g, Ji, Jj, W, Hblocks, U, cl, damp, free)
        full = solver._make_hvp(g, Ji, Jj, W, damp, free)
        v = jax.random.normal(jax.random.PRNGKey(8), (g.node_capacity, 6))
        np.testing.assert_allclose(
            np.asarray(split(v)), np.asarray(full(v)), rtol=1e-6, atol=1e-6
        )

    def test_end_to_end_split_threshold_override(self):
        g, _ = synthetic.make_pose_graph(KEY, 48, loop_closure_every=9)
        base = solver.SolverConfig(iterations=8)
        forced = solver.SolverConfig(iterations=8, split_hv_threshold=1)
        g_a, _ = solver.optimize(g, base)
        g_b, _ = solver.optimize(g, forced)
        # loose atol: split vs full-scatter Hv differ in summation order
        # only, but LM accept/reject chains amplify last-ulp differences;
        # the tight exactness checks are the direct Hv comparisons above
        np.testing.assert_allclose(
            np.asarray(g_a.pose), np.asarray(g_b.pose), atol=1e-2
        )


# The g2o-equivalent oracle lives in the package so tests AND the bench
# share one implementation.
from uzliti_slam_tpu.graph.oracle import sparse_gn_oracle  # noqa: E402


class TestOracleParityAtScale:
    """VERDICT r1 #1 acceptance: the DEFAULT solver config reaches a final
    chi2 within 10% of the sparse-GN oracle at 1k and 10k nodes."""

    def _run(self, n_nodes):
        g, _ = synthetic.make_pose_graph(
            KEY, n_nodes, loop_closure_every=10
        )
        ref_poses = sparse_gn_oracle(g, iters=12)
        ref_chi2 = float(solver.total_chi2(g, ref_poses, 1.0))
        g2, stats = solver.optimize(g, solver.SolverConfig())
        our_chi2 = float(solver.total_chi2(g, g2.pose, 1.0))
        assert np.isfinite(our_chi2)
        assert our_chi2 <= ref_chi2 * 1.10 + 1e-3, (our_chi2, ref_chi2)
        return our_chi2, ref_chi2

    def test_128_nodes_default_config_matches_oracle(self):
        self._run(128)

    @pytest.mark.slow
    def test_1k_nodes_default_config_matches_oracle(self):
        self._run(1000)

    @pytest.mark.slow
    def test_10k_nodes_default_config_matches_oracle(self):
        self._run(10_000)

    @pytest.mark.slow
    def test_100k_nodes_default_config_matches_oracle(self):
        """VERDICT r3 #4 acceptance: 100k-scale convergence within 10% of
        the sparse-LM oracle (undamped GN diverges at this scale — g2o
        itself runs LM, so the oracle does too)."""
        g, _ = synthetic.make_pose_graph(
            KEY, 100_000, loop_closure_every=10
        )
        ref_poses = sparse_gn_oracle(g, iters=20, lm=True)
        ref_chi2 = float(solver.total_chi2(g, ref_poses, 1.0))
        g2, stats = solver.optimize(g, solver.SolverConfig())
        our_chi2 = float(solver.total_chi2(g, g2.pose, 1.0))
        assert np.isfinite(our_chi2)
        assert our_chi2 <= ref_chi2 * 1.10 + 1e-3, (our_chi2, ref_chi2)


class TestDenseGathers:
    """dense_gathers one-hot matmul form must match indexed gathers."""

    def test_dense_matches_indexed(self):
        from uzliti_slam_tpu.io import synthetic

        g, _ = synthetic.make_pose_graph(
            jax.random.PRNGKey(3), 48, loop_closure_every=8
        )
        base = solver.SolverConfig(iterations=6, pcg_iterations=8,
                                   chain_dense_cutoff=16, chain_root_ns=True,
                                   early_exit=False)
        dense = dataclasses.replace(base, dense_gathers=True)
        g_a, st_a = solver.optimize(g, base)
        g_b, st_b = solver.optimize(g, dense)
        # one-hot selection at HIGHEST precision is numerically the same
        # computation — histories must agree to float accumulation noise
        np.testing.assert_allclose(
            np.asarray(st_b.chi2_history), np.asarray(st_a.chi2_history),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g_b.pose), np.asarray(g_a.pose), atol=1e-3
        )

    def test_fixed_iteration_fast_path_matches_generic(self):
        from uzliti_slam_tpu.io import synthetic

        g, _ = synthetic.make_pose_graph(
            jax.random.PRNGKey(4), 48, loop_closure_every=8
        )
        fast = solver.SolverConfig(iterations=6, pcg_iterations=8,
                                   early_exit=False, precond_refresh=3)
        generic = dataclasses.replace(fast, mode="pcg")
        _, st_fast = solver.optimize(g, fast)
        _, st_gen = solver.optimize(g, generic)
        np.testing.assert_allclose(
            np.asarray(st_fast.chi2_history),
            np.asarray(st_gen.chi2_history), rtol=1e-4,
        )
