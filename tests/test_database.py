"""SQLite graph database backend (io/database.py) — the MongodbStorage
analog: write-through upserts, removal, and full loadGraph round trip."""

import numpy as np
import pytest

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import database, synthetic


@pytest.fixture()
def graph():
    import jax

    g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(3), 24, loop_closure_every=6)
    return g


def test_round_trip(tmp_path, graph):
    db = database.GraphDatabase(str(tmp_path / "g.db"))
    db.sync_graph(graph)
    n, e = db.counts()
    assert n == int(np.sum(np.asarray(graph.node_valid)))
    assert e == int(graph.num_edges)

    g2 = db.load_graph(graph.node_capacity, graph.edge_capacity)
    np.testing.assert_allclose(
        np.asarray(g2.pose), np.asarray(graph.pose), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g2.e_info), np.asarray(graph.e_info), atol=1e-6
    )
    assert int(g2.num_nodes) == int(graph.num_nodes)
    assert int(g2.num_edges) == int(graph.num_edges)
    assert np.array_equal(np.asarray(g2.e_type), np.asarray(graph.e_type))
    assert np.array_equal(np.asarray(g2.node_uid), np.asarray(graph.node_uid))
    db.close()


def test_write_through_upsert(tmp_path, graph):
    import jax.numpy as jnp

    db = database.GraphDatabase(str(tmp_path / "g.db"))
    db.sync_graph(graph)
    # move one node and re-store just that slot — row must be replaced
    g2 = graph._replace(pose=graph.pose.at[3, 0].set(99.0))
    db.store_nodes(g2, [3])
    g3 = db.load_graph(graph.node_capacity, graph.edge_capacity)
    assert float(g3.pose[3, 0]) == pytest.approx(99.0)
    n, _ = db.counts()
    assert n == int(jnp.sum(graph.node_valid))
    db.close()


def test_remove_and_dangling_edges(tmp_path, graph):
    db = database.GraphDatabase(str(tmp_path / "g.db"))
    db.sync_graph(graph)
    uid = int(graph.node_uid[0])
    db.remove_node(uid)
    g2 = db.load_graph(graph.node_capacity, graph.edge_capacity)
    assert not bool(g2.node_valid[0])
    # edges touching the removed node are dropped on load (defensive
    # exists-check semantics)
    ef = np.asarray(g2.e_from)[: int(g2.num_edges)]
    et = np.asarray(g2.e_to)[: int(g2.num_edges)]
    assert not (ef == 0).any() and not (et == 0).any()
    db.close()


def test_clear_and_reopen(tmp_path, graph):
    p = str(tmp_path / "g.db")
    db = database.GraphDatabase(p)
    db.sync_graph(graph)
    db.close()
    db = database.GraphDatabase(p)  # reopen keeps rows
    assert db.counts()[0] > 0
    db.close()
    db = database.GraphDatabase(p, clear=True)  # clear wipes
    assert db.counts() == (0, 0)
    db.close()


def test_convert_snapshot_db_round_trip(tmp_path, graph):
    from uzliti_slam_tpu.io import storage

    snap = str(tmp_path / "snap")
    storage.save_state(snap, graph)
    dbp = str(tmp_path / "g.db")
    database.snapshot_to_database(
        snap, dbp, gstate.empty_graph(graph.node_capacity, graph.edge_capacity)
    )
    snap2 = str(tmp_path / "snap2")
    database.database_to_snapshot(
        dbp, snap2, graph.node_capacity, graph.edge_capacity
    )
    g2 = storage.load_state(
        snap2, gstate.empty_graph(graph.node_capacity, graph.edge_capacity)
    )
    np.testing.assert_allclose(
        np.asarray(g2.pose), np.asarray(graph.pose), atol=1e-6
    )
    assert int(g2.num_edges) == int(graph.num_edges)


def test_empty_graph_loads(tmp_path):
    db = database.GraphDatabase(str(tmp_path / "g.db"))
    g = db.load_graph(8, 16)
    assert int(g.num_nodes) == 0 and int(g.num_edges) == 0
    assert not bool(np.asarray(g.node_valid).any())
    db.close()
