"""SQLite per-entity graph database — the reference's second storage
backend.

The reference persists the graph either as one rosbag per node/edge/meta
(``graph_slam_common/src/rosbag_storage.cpp:62-236``) or through a MongoDB
``MessageCollection`` per entity type (``mongodb_storage.cpp:25-60``, DB
"global_slam"), with write-through on every ``addNode``/``addEdge`` when
``sync_to_database`` is set (``slam_graph.cpp:154-156, 337-339``) and a
full re-read at startup (``loadGraph``, ``rosbag_storage.cpp:135-211``).

This backend keeps those semantics on the TPU-native struct-of-arrays
graph: rows are keyed by the stable ``node_uid`` (the int replacement for
the reference's string UUIDs), upserts are idempotent, and ``load_graph``
rebuilds a padded ``GraphState`` from the rows. It complements
``io/storage.py`` (whole-pytree npz snapshot — the "rosbag" analog) as the
queryable-database analog; SQLite stands in for MongoDB (zero-dependency,
single-file, transactional).
"""

from __future__ import annotations

import os
import sqlite3

import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import state as gstate

_SCHEMA = """
CREATE TABLE IF NOT EXISTS nodes (
    uid INTEGER PRIMARY KEY,
    slot INTEGER NOT NULL,
    pose BLOB NOT NULL,
    odom_pose BLOB NOT NULL,
    stamp REAL NOT NULL,
    uncertainty REAL NOT NULL,
    fixed INTEGER NOT NULL,
    merged_into INTEGER NOT NULL
);
CREATE TABLE IF NOT EXISTS edges (
    slot INTEGER PRIMARY KEY,
    from_uid INTEGER NOT NULL,
    to_uid INTEGER NOT NULL,
    transform BLOB NOT NULL,
    info BLOB NOT NULL,
    type INTEGER NOT NULL,
    valid INTEGER NOT NULL,
    error REAL NOT NULL,
    age REAL NOT NULL,
    score REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS meta (
    key TEXT PRIMARY KEY,
    value BLOB NOT NULL
);
CREATE TABLE IF NOT EXISTS sensor_data (
    uid INTEGER PRIMARY KEY,
    desc BLOB NOT NULL,
    desc_valid BLOB NOT NULL,
    points BLOB NOT NULL,
    scan BLOB NOT NULL,
    scan_valid INTEGER NOT NULL,
    gist BLOB NOT NULL
);
"""


class GraphDatabase:
    """Write-through graph persistence over SQLite.

    Mirrors the reference ``SlamStorage`` API surface
    (``slam_graph_storage.h:30-50``): store/remove node, store/remove edge,
    store meta, clear, loadGraph.
    """

    def __init__(self, path: str, clear: bool = False):
        if clear and os.path.exists(path):
            os.unlink(path)
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        self._db = sqlite3.connect(path)
        self._db.executescript(_SCHEMA)
        self._db.commit()

    def close(self) -> None:
        self._db.close()

    # -- write-through (slam_graph.cpp:154-156, 337-339) ------------------

    def store_nodes(self, g: gstate.GraphState, slots) -> int:
        """Upsert the given node slots (invalid slots are skipped)."""
        slots = np.atleast_1d(np.asarray(slots, np.int64))
        pose = np.asarray(g.pose, np.float64)
        odom = np.asarray(g.odom_pose, np.float64)
        stamp = np.asarray(g.stamp, np.float64)
        unc = np.asarray(g.uncertainty, np.float64)
        valid = np.asarray(g.node_valid)
        fixed = np.asarray(g.node_fixed)
        merged = np.asarray(g.merged_into, np.int64)
        uid = np.asarray(g.node_uid, np.int64)
        rows = [
            (
                int(uid[s]), int(s), pose[s].tobytes(), odom[s].tobytes(),
                float(stamp[s]), float(unc[s]), int(fixed[s]), int(merged[s]),
            )
            for s in slots
            if valid[s]
        ]
        self._db.executemany(
            "INSERT OR REPLACE INTO nodes VALUES (?,?,?,?,?,?,?,?)", rows
        )
        self._db.commit()
        return len(rows)

    def store_edges(self, g: gstate.GraphState, slots) -> int:
        """Upsert the given edge slots (keyed by slot; endpoints stored as
        uids so merges/evictions on other instances stay consistent)."""
        slots = np.atleast_1d(np.asarray(slots, np.int64))
        uid = np.asarray(g.node_uid, np.int64)
        e_from = np.asarray(g.e_from, np.int64)
        e_to = np.asarray(g.e_to, np.int64)
        tr = np.asarray(g.e_transform, np.float64)
        info = np.asarray(g.e_info, np.float64)
        etype = np.asarray(g.e_type, np.int64)
        evalid = np.asarray(g.e_valid)
        err = np.asarray(g.e_error, np.float64)
        age = np.asarray(g.e_age, np.float64)
        score = np.asarray(g.e_score, np.float64)
        n_edges = int(g.num_edges)
        rows = [
            (
                int(s), int(uid[e_from[s]]), int(uid[e_to[s]]),
                tr[s].tobytes(), info[s].tobytes(), int(etype[s]),
                int(evalid[s]), float(err[s]), float(age[s]), float(score[s]),
            )
            for s in slots
            if s < n_edges
        ]
        self._db.executemany(
            "INSERT OR REPLACE INTO edges VALUES (?,?,?,?,?,?,?,?,?,?)", rows
        )
        self._db.commit()
        return len(rows)

    def sync_graph(self, g: gstate.GraphState) -> None:
        """Full write-through of every live entity (storeMetaInformation +
        per-entity stores, rosbag_storage.cpp:92-105).

        Also RECONCILES: rows whose node was evicted/merged in memory are
        deleted (the reference's storage mirrors removeNode,
        ``slam_graph.cpp:166-174``), and edge rows past the current
        high-water mark are dropped — otherwise the next ``load_graph``
        would resurrect entities the in-memory graph no longer has."""
        self.store_nodes(g, np.arange(g.node_capacity))
        self.store_edges(g, np.arange(int(g.num_edges)))
        valid = np.asarray(g.node_valid)
        uid = np.asarray(g.node_uid, np.int64)
        # temp table sidesteps SQLite's bound-parameter limit at 100k nodes
        self._db.execute(
            "CREATE TEMP TABLE IF NOT EXISTS live_uids (uid INTEGER PRIMARY KEY)"
        )
        self._db.execute("DELETE FROM live_uids")
        self._db.executemany(
            "INSERT OR IGNORE INTO live_uids VALUES (?)",
            [(int(u),) for u in uid[valid]],
        )
        self._db.execute(
            "DELETE FROM nodes WHERE uid NOT IN (SELECT uid FROM live_uids)"
        )
        self._db.execute(
            "DELETE FROM sensor_data WHERE uid NOT IN (SELECT uid FROM live_uids)"
        )
        self._db.execute(
            "DELETE FROM edges WHERE slot >= ?", (int(g.num_edges),)
        )
        # persist the high-water marks: uids are minted from num_nodes, so
        # deriving it from surviving rows on load would reuse issued uids
        self.store_meta(
            "counters",
            np.array([int(g.num_nodes), int(g.num_edges)], np.float64),
        )
        self.store_meta("diff_transform", np.asarray(g.diff_transform, np.float64))

    def store_sensor_rows(self, rows) -> int:
        """Upsert per-node sensor payloads: rows of (uid, desc (F,32) u8,
        desc_valid (F,) bool, points (F,3) f32, scan (B,) f32,
        scan_valid bool, gist (32,) u8) — the reference stores the full
        SensorDataArray per node (``rosbag_storage.cpp:62-105``)."""
        packed = [
            (
                int(uid),
                np.asarray(desc, np.uint8).tobytes(),
                np.packbits(np.asarray(dv, bool)).tobytes(),
                np.asarray(pts, np.float32).tobytes(),
                np.asarray(scan, np.float32).tobytes(),
                int(bool(sv)),
                np.asarray(gist, np.uint8).tobytes(),
            )
            for uid, desc, dv, pts, scan, sv, gist in rows
        ]
        self._db.executemany(
            "INSERT OR REPLACE INTO sensor_data VALUES (?,?,?,?,?,?,?)", packed
        )
        self._db.commit()
        return len(packed)

    def load_sensor_rows(self, n_feats: int, n_bins: int):
        """Yield (uid, desc, desc_valid, points, scan, scan_valid, gist)."""
        for uid, d, dv, pts, scan, sv, gist in self._db.execute(
            "SELECT * FROM sensor_data"
        ):
            yield (
                uid,
                np.frombuffer(d, np.uint8).reshape(n_feats, 32),
                np.unpackbits(
                    np.frombuffer(dv, np.uint8), count=n_feats
                ).astype(bool),
                np.frombuffer(pts, np.float32).reshape(n_feats, 3),
                np.frombuffer(scan, np.float32),
                bool(sv),
                np.frombuffer(gist, np.uint8),
            )

    def remove_node(self, uid: int) -> None:
        self._db.execute("DELETE FROM nodes WHERE uid=?", (int(uid),))
        self._db.commit()

    def remove_edge(self, slot: int) -> None:
        self._db.execute("DELETE FROM edges WHERE slot=?", (int(slot),))
        self._db.commit()

    def store_meta(self, key: str, value: np.ndarray) -> None:
        self._db.execute(
            "INSERT OR REPLACE INTO meta VALUES (?,?)",
            (key, np.asarray(value, np.float64).tobytes()),
        )
        self._db.commit()

    def load_meta(self, key: str) -> np.ndarray | None:
        row = self._db.execute("SELECT value FROM meta WHERE key=?", (key,)).fetchone()
        if row is None:
            return None
        return np.frombuffer(row[0], np.float64)

    # -- load (rosbag_storage.cpp:135-211) ---------------------------------

    def counts(self) -> tuple[int, int]:
        n = self._db.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
        e = self._db.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
        return n, e

    def load_graph(self, node_capacity: int, edge_capacity: int) -> gstate.GraphState:
        """Rebuild a padded GraphState from rows. Node rows return to their
        stored slots; edge endpoints are resolved uid→slot (rows whose
        endpoints are missing are dropped, the reference's defensive
        exists-check on load)."""
        g = gstate.empty_graph(node_capacity, edge_capacity)
        pose = np.asarray(g.pose).copy()
        odom = np.asarray(g.odom_pose).copy()
        stamp = np.zeros(node_capacity)
        unc = np.zeros(node_capacity)
        valid = np.zeros(node_capacity, bool)
        fixed = np.zeros(node_capacity, bool)
        merged = np.arange(node_capacity, dtype=np.int32)
        uids = np.full(node_capacity, -1, np.int64)
        max_slot = -1
        uid_to_slot: dict[int, int] = {}
        for uid, slot, p, op, st, un, fx, mg in self._db.execute(
            "SELECT * FROM nodes ORDER BY slot"
        ):
            if slot >= node_capacity:
                raise ValueError(
                    f"node slot {slot} exceeds capacity {node_capacity}"
                )
            pose[slot] = np.frombuffer(p, np.float64)
            odom[slot] = np.frombuffer(op, np.float64)
            stamp[slot] = st
            unc[slot] = un
            valid[slot] = True
            fixed[slot] = bool(fx)
            merged[slot] = mg
            uids[slot] = uid
            uid_to_slot[uid] = slot
            max_slot = max(max_slot, slot)

        e_from = np.zeros(edge_capacity, np.int32)
        e_to = np.zeros(edge_capacity, np.int32)
        e_tr = np.asarray(g.e_transform).copy()
        e_info = np.zeros((edge_capacity, 6, 6))
        e_type = np.zeros(edge_capacity, np.int32)
        e_valid = np.zeros(edge_capacity, bool)
        e_err = np.zeros(edge_capacity)
        e_age = np.zeros(edge_capacity)
        e_score = np.zeros(edge_capacity)
        n_edges = 0
        for slot, fu, tu, tr, info, ty, va, er, ag, sc in self._db.execute(
            "SELECT * FROM edges ORDER BY slot"
        ):
            if fu not in uid_to_slot or tu not in uid_to_slot:
                continue
            if n_edges >= edge_capacity:
                raise ValueError(f"edge count exceeds capacity {edge_capacity}")
            s = n_edges
            e_from[s] = uid_to_slot[fu]
            e_to[s] = uid_to_slot[tu]
            e_tr[s] = np.frombuffer(tr, np.float64)
            e_info[s] = np.frombuffer(info, np.float64).reshape(6, 6)
            e_type[s] = ty
            e_valid[s] = bool(va)
            e_err[s] = er
            e_age[s] = ag
            e_score[s] = sc
            n_edges += 1

        diff = self.load_meta("diff_transform")
        counters = self.load_meta("counters")
        # the node high-water mark comes from meta when available: uids are
        # minted as instance_id*1e6 + num_nodes, so deriving it from the
        # surviving max slot after the highest-slot node was removed would
        # reuse already-issued uids. Edges carry no uid and are re-packed to
        # the front here, so their count is simply the surviving rows.
        num_nodes = int(counters[0]) if counters is not None else max_slot + 1
        num_nodes = max(num_nodes, max_slot + 1)
        num_edges = n_edges
        return g._replace(
            pose=jnp.asarray(pose, g.pose.dtype),
            odom_pose=jnp.asarray(odom, g.odom_pose.dtype),
            stamp=jnp.asarray(stamp, g.stamp.dtype),
            uncertainty=jnp.asarray(unc, g.uncertainty.dtype),
            node_valid=jnp.asarray(valid),
            node_fixed=jnp.asarray(fixed),
            merged_into=jnp.asarray(merged, jnp.int32),
            node_uid=jnp.asarray(uids, g.node_uid.dtype),
            e_from=jnp.asarray(e_from),
            e_to=jnp.asarray(e_to),
            e_transform=jnp.asarray(e_tr, g.e_transform.dtype),
            e_info=jnp.asarray(e_info, g.e_info.dtype),
            e_type=jnp.asarray(e_type),
            e_valid=jnp.asarray(e_valid),
            e_error=jnp.asarray(e_err, g.e_error.dtype),
            e_age=jnp.asarray(e_age, g.e_age.dtype),
            e_score=jnp.asarray(e_score, g.e_score.dtype),
            num_nodes=jnp.asarray(num_nodes, jnp.int32),
            num_edges=jnp.asarray(num_edges, jnp.int32),
            diff_transform=(
                jnp.asarray(diff, g.diff_transform.dtype)
                if diff is not None else g.diff_transform
            ),
        )


# ---------------------------------------------------------------------------
# Backend converter (the reference's convert_database.cpp tool)
# ---------------------------------------------------------------------------

def snapshot_to_database(snapshot_path: str, db_path: str, template) -> None:
    """Convert an npz checkpoint (io/storage.py — the "rosbag" analog) into
    the SQLite backend. ``template`` is a matching SlamState/GraphState
    (see ``storage.load_state``)."""
    from uzliti_slam_tpu.io import storage

    state = storage.load_state(snapshot_path, template)
    g = state.graph if hasattr(state, "graph") else state
    db = GraphDatabase(db_path, clear=True)
    try:
        db.sync_graph(g)
    finally:
        db.close()


def database_to_snapshot(
    db_path: str, snapshot_path: str, node_capacity: int, edge_capacity: int
) -> None:
    """Convert the SQLite backend into an npz GraphState checkpoint."""
    from uzliti_slam_tpu.io import storage

    db = GraphDatabase(db_path)
    try:
        g = db.load_graph(node_capacity, edge_capacity)
    finally:
        db.close()
    storage.save_state(snapshot_path, g)
