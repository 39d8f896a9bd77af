"""Local/global scope protocol tests (SURVEY.md §3.4, P2)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie
from uzliti_slam_tpu.parallel import scope

KEY = jax.random.PRNGKey(0)


def local_graph(n=10):
    g, gt = synthetic.make_pose_graph(KEY, n, node_capacity=32, edge_capacity=64)
    gists = jax.random.randint(
        jax.random.PRNGKey(1), (32, 32), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    return g, gists


class TestDelta:
    def test_roundtrip_ships_everything(self):
        g, gists = local_graph(10)
        ship = scope.ship_state_init(g)
        delta = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        assert int((delta.n_uid >= 0).sum()) == 10
        assert int((delta.e_type >= 0).sum()) == 9

        glob = gstate.empty_graph(64, 128)
        glob, ack = scope.apply_delta(glob, delta)
        assert int(glob.num_nodes) == 10
        assert int(glob.num_edges) == 9
        # ACK covers all shipped entries
        assert int((ack.node_uids >= 0).sum()) == 10
        assert int((ack.edge_from >= 0).sum()) == 9

        ship = scope.apply_ack(g, ship, ack)
        assert int(ship.node_acked.sum()) == 10
        assert int(ship.edge_acked.sum()) == 9
        # next delta is empty — nothing to resend
        d2 = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        assert int((d2.n_uid >= 0).sum()) == 0
        assert int((d2.e_type >= 0).sum()) == 0

    def test_idempotent_redelivery(self):
        g, gists = local_graph(8)
        ship = scope.ship_state_init(g)
        delta = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        glob = gstate.empty_graph(64, 128)
        glob, _ = scope.apply_delta(glob, delta)
        # duplicate delivery (lost ACK): no duplicates created
        glob2, ack2 = scope.apply_delta(glob, delta)
        assert int(glob2.num_nodes) == int(glob.num_nodes)
        assert int(glob2.num_edges) == int(glob.num_edges)
        # but still fully ACKed so local stops resending
        assert int((ack2.node_uids >= 0).sum()) == 8

    def test_edge_without_nodes_skipped_not_acked(self):
        g, gists = local_graph(8)
        ship = scope.ship_state_init(g)
        # ship only edges (pretend nodes were lost): craft delta with no nodes
        delta = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        delta = delta._replace(n_uid=jnp.full_like(delta.n_uid, -1))
        glob = gstate.empty_graph(64, 128)
        glob, ack = scope.apply_delta(glob, delta)
        assert int(glob.num_edges) == 0
        assert int((ack.edge_from >= 0).sum()) == 0  # unACKed -> resent later

    def test_incremental_shipping(self):
        g, gists = local_graph(6)
        ship = scope.ship_state_init(g)
        glob = gstate.empty_graph(64, 128)
        # first shipment limited to 3 nodes
        d1 = scope.make_delta(g, ship, gists, max_nodes=3, max_edges=4)
        glob, ack1 = scope.apply_delta(glob, d1)
        ship = scope.apply_ack(g, ship, ack1)
        # second shipment carries the rest
        d2 = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        glob, ack2 = scope.apply_delta(glob, d2)
        ship = scope.apply_ack(g, ship, ack2)
        assert int(glob.num_nodes) == 6
        assert int(ship.node_acked.sum()) == 6
        assert int(glob.num_edges) == 5


class TestScopeExchange:
    def test_reply_marks_fixed_in_radius(self):
        g, _ = local_graph(10)
        center = g.pose[9]
        reply = scope.scope_reply(g, center, jnp.asarray(3.0), max_nodes=8)
        got = np.asarray(reply.uid)
        assert (got >= 0).sum() >= 1
        # all replied nodes are within radius
        for i, uid in enumerate(got):
            if uid >= 0:
                d = float(jnp.linalg.norm(
                    lie.pose_t(reply.pose[i]) - lie.pose_t(center)
                ))
                assert d <= 3.0 + 1e-5

    def test_apply_scope_freezes_known_and_inserts_unknown(self):
        g, _ = local_graph(5)
        # a reply containing node uid 2 (known, with a shifted pose) and
        # uid 777 (unknown boundary node)
        reply = scope.ScopeReply(
            uid=jnp.array([2, 777, -1], dtype=jnp.int32),
            pose=jnp.stack([
                lie.make_pose(jnp.array([9.0, 9.0, 0.0]), jnp.array([1.0, 0, 0, 0])),
                lie.make_pose(jnp.array([1.0, 2.0, 0.0]), jnp.array([1.0, 0, 0, 0])),
                lie.pose_identity(),
            ]),
            stamp=jnp.array([0.2, 99.0, 0.0]),
        )
        g2 = scope.apply_scope(g, reply)
        assert bool(g2.node_fixed[2])
        np.testing.assert_allclose(np.asarray(g2.pose[2, :3]), [9.0, 9.0, 0.0])
        # unknown node inserted as fixed
        slot = scope.uid_to_slot(g2, jnp.array([777], dtype=jnp.int32))[0]
        assert int(slot) >= 0
        assert bool(g2.node_fixed[int(slot)])
        assert int(g2.num_nodes) == 6

    def test_end_to_end_local_global_convergence(self):
        """Local solves with a fixed boundary from global; shipping keeps
        the global graph consistent and optimizable."""
        g, gists = local_graph(10)
        ship = scope.ship_state_init(g)
        glob = gstate.empty_graph(64, 128)
        delta = scope.make_delta(g, ship, gists, max_nodes=16, max_edges=32)
        glob, ack = scope.apply_delta(glob, delta)
        glob_opt, stats = solver.optimize(glob, solver.SolverConfig(iterations=10))
        assert np.isfinite(float(stats.chi2_history[-1]))
        # boundary back to local: freeze optimized poses near current robot
        reply = scope.scope_reply(glob_opt, g.pose[9], jnp.asarray(5.0), max_nodes=4)
        g2 = scope.apply_scope(g, reply)
        g2_opt, _ = solver.optimize(g2, solver.SolverConfig(iterations=10))
        # frozen boundary nodes did not move in the local solve
        for i, uid in enumerate(np.asarray(reply.uid)):
            if uid >= 0:
                slot = int(scope.uid_to_slot(g2, jnp.array([uid], dtype=jnp.int32))[0])
                np.testing.assert_allclose(
                    np.asarray(g2_opt.pose[slot]), np.asarray(reply.pose[i]), atol=1e-6
                )
