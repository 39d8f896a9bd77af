"""Multi-host helpers degrade correctly to the single-process 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.parallel import multihost


class TestMultihost:
    def test_initialize_noop_single_process(self):
        multihost.initialize()  # must not raise

    def test_pod_mesh_shapes(self):
        mesh = multihost.pod_mesh(batch_axis=2, edge_axis=4)
        assert mesh.shape == {"batch": 2, "edge": 4}
        with pytest.raises(ValueError, match="devices"):
            multihost.pod_mesh(batch_axis=3, edge_axis=4)

    def test_partial_axis_derived(self):
        mesh = multihost.pod_mesh(batch_axis=4)
        assert mesh.shape == {"batch": 4, "edge": 2}
        mesh = multihost.pod_mesh(edge_axis=2)
        assert mesh.shape == {"batch": 4, "edge": 2}

    @pytest.mark.slow
    def test_fleet_uses_all_devices(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 8)
        graphs = [synthetic.make_pose_graph(k, 24, loop_closure_every=8)[0] for k in keys]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
        mesh = multihost.pod_mesh(batch_axis=2, edge_axis=4)
        out = multihost.solve_fleet(batched, mesh, solver.SolverConfig(iterations=2))
        # batch dim sharded over batch*edge = 8 devices -> 1 instance each
        shard_shapes = {s.data.shape[0] for s in out.pose.addressable_shards}
        assert shard_shapes == {1}

    def test_fleet_solve_matches_individual(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        graphs = [synthetic.make_pose_graph(k, 24, loop_closure_every=8)[0] for k in keys]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
        mesh = multihost.pod_mesh(batch_axis=8, edge_axis=1)
        cfg = solver.SolverConfig(iterations=5)
        out = multihost.solve_fleet(batched, mesh, cfg)
        # reference must precondition exactly as the fleet default
        # resolves (cutoff 16 + NS root + dense gathers at 24 nodes) for
        # unconverged LM trajectories to be comparable
        ref_cfg = solver.SolverConfig(
            iterations=5, chain_dense_cutoff=16, chain_root_ns=True,
            dense_gathers=True,
        )
        ref = solver.optimize(graphs[3], ref_cfg)[0]
        # loose atol: batched vs single linalg.inv lowerings differ in the
        # last ulp and 5 LM iterations amplify it; real sharding bugs are
        # meters-scale
        np.testing.assert_allclose(
            np.asarray(out.pose[3]), np.asarray(ref.pose), atol=1e-2
        )
        # tighter companion at ONE iteration, where accept/reject chains
        # cannot diverge: fleet and single solve start from the identical
        # iterate, so the post-step cost must match to reduction-order
        # noise — a mis-sharded solve is orders of magnitude off. The
        # explicit config mirrors what the fleet default resolves to, so
        # both sides precondition identically.
        cfg1 = solver.SolverConfig(
            iterations=1, chain_dense_cutoff=16, chain_root_ns=True,
            dense_gathers=True,
        )
        out1 = multihost.solve_fleet(batched, mesh, cfg1)
        ref1 = solver.optimize(graphs[3], cfg1)[0]
        chi_fleet = float(
            solver.total_chi2(graphs[3], out1.pose[3], cfg1.huber_delta)
        )
        chi_ref = float(solver.total_chi2(graphs[3], ref1.pose, cfg1.huber_delta))
        assert abs(chi_fleet - chi_ref) <= 1e-3 * max(chi_ref, 1e-9)
