"""Edge-sharded and instance-batched solves on the 8-device CPU mesh must
match the single-device solver (SURVEY.md §7 phase 10)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.parallel import sharded

KEY = jax.random.PRNGKey(0)


def _mesh(n, name):
    return Mesh(np.array(jax.devices()[:n]), (name,))


class TestEdgeSharded:
    def test_matches_single_device(self):
        g, _ = synthetic.make_pose_graph(KEY, 32, loop_closure_every=8)
        g = sharded.pad_edges_to_multiple(g, 8)
        cfg = solver.SolverConfig(iterations=5)
        g_ref, stats_ref = solver.optimize(g, cfg)

        mesh = _mesh(8, "edge")
        g_sh, chi2_hist = sharded.optimize_sharded(g, mesh, "edge", cfg)
        # loose atol: the 8-way psum reorders the edge reductions and the
        # single-device path fuses differently under jit; LM accept/reject
        # chains amplify last-ulp differences over the iterations.  A
        # sharding BUG (wrong psum, mis-partitioned edge table) shows up
        # as meters, not centimeters.
        np.testing.assert_allclose(
            np.asarray(g_sh.pose), np.asarray(g_ref.pose), atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(chi2_hist), np.asarray(stats_ref.chi2_history), rtol=5e-2
        )
        # tighter companion (robust to LM accept/reject divergence): the
        # first iterations start from the identical iterate, so they must
        # match to reduction-order noise — a reduction/psum bug costs
        # orders of magnitude here
        np.testing.assert_allclose(
            np.asarray(chi2_hist[:2]),
            np.asarray(stats_ref.chi2_history[:2]),
            rtol=1e-3,
        )

    def test_jit_wrapped(self):
        g, _ = synthetic.make_pose_graph(KEY, 32, loop_closure_every=8)
        g = sharded.pad_edges_to_multiple(g, 8)
        mesh = _mesh(8, "edge")
        cfg = solver.SolverConfig(iterations=5)
        f = jax.jit(lambda gr: sharded.optimize_sharded(gr, mesh, "edge", cfg)[0].pose)
        p = f(g)
        assert np.all(np.isfinite(np.asarray(p)))

    def test_pad_edges(self):
        g, _ = synthetic.make_pose_graph(KEY, 10)
        g2 = sharded.pad_edges_to_multiple(g, 8)
        assert g2.edge_capacity % 8 == 0
        assert not np.any(np.asarray(g2.e_valid[g.edge_capacity:]))


class TestBatch:
    def test_batched_instances(self):
        keys = jax.random.split(KEY, 8)
        graphs = [synthetic.make_pose_graph(k, 24, loop_closure_every=8)[0] for k in keys]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
        mesh = _mesh(8, "batch")
        out = sharded.optimize_batch(batched, mesh, "batch", solver.SolverConfig(iterations=5))
        # each instance must match its individual solve. The reference
        # runs the SAME preconditioner configuration the fleet default
        # resolves to (cutoff 16 + NS root) — a different preconditioner
        # changes unconverged LM trajectories legitimately. Loose atol:
        # batched vs single lowerings differ in the last ulp and 5 LM
        # iterations amplify it; a sharding BUG shows up as meters.
        ref_cfg = solver.SolverConfig(
            iterations=5, chain_dense_cutoff=16, chain_root_ns=True
        )
        ref0 = solver.optimize(graphs[0], ref_cfg)[0]
        ref5 = solver.optimize(graphs[5], ref_cfg)[0]
        np.testing.assert_allclose(np.asarray(out.pose[0]), np.asarray(ref0.pose), atol=5e-2)
        np.testing.assert_allclose(np.asarray(out.pose[5]), np.asarray(ref5.pose), atol=5e-2)
