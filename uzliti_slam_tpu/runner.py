"""Dual-instance local/global deployment: two live SLAM instances wired by
the scope protocol.

This is the reference's flagship topology
(``iti_slam_launch/launch/slam.launch:1-22``): a LOCAL bounded-scope SLAM
(``is_sub_graph: true``, ``yaml/local_slam.yaml``) ingests keyframes and
keeps only a window around the robot, while a GLOBAL persistent SLAM
(``is_super_graph: true``, ``construct_nodes: false``, ``merge_nodes:
true``, ``yaml/global_slam.yaml``) accumulates the full map. They exchange:

- graph deltas with resend-until-ACK   (``/sub_graph`` → ``/graph_received``,
  ``graph_slam_node.cpp:356-396, 434-533``)
- scope requests answered with fixed boundary nodes (``/request_scope`` →
  ``/scope_graph``, ``:535-663``)
- eviction of shipped out-of-scope local nodes (``:619-660``) and node
  merging on the global (``:665-777``)

Here both instances live in one process and "transport" is array passing
(``parallel/scope.py`` is transport-agnostic: the same deltas serialize via
``io.storage`` or ship across hosts over DCN).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import SlamConfig
from uzliti_slam_tpu.graph import lifecycle
from uzliti_slam_tpu.parallel import scope
from uzliti_slam_tpu.recognition import recognizer as rec


def local_config(base: SlamConfig | None = None) -> SlamConfig:
    """The ``local_slam.yaml`` role: bounded scope, no merging."""
    base = base or SlamConfig()
    return dataclasses.replace(
        base,
        instance_id=base.instance_id,
        scope=dataclasses.replace(
            base.scope, is_sub_graph=True, merge_nodes=False
        ),
    )


def global_config(base: SlamConfig | None = None) -> SlamConfig:
    """The ``global_slam.yaml`` role: persistent, merging, no construction."""
    base = base or SlamConfig()
    return dataclasses.replace(
        base,
        instance_id=base.instance_id + 1,
        scope=dataclasses.replace(
            base.scope, is_sub_graph=False, merge_nodes=True
        ),
    )


@jax.jit
def _absorb_payloads_jit(state, delta):
    """Scatter a delta's sensor payloads into the global banks: gist into
    the PR bank (the reference re-runs PR on received nodes, ``:473-476``)
    plus descriptors/3-D points/virtual scans (``Node.msg`` ships the full
    SensorDataArray). Returns (state, slots, fresh) where ``fresh`` marks
    nodes whose payload just landed (drive ``pipeline.recognize_absorbed``
    with it)."""
    graph = state.graph
    uids = delta.n_uid
    slots = scope.uid_to_slot(graph, uids)
    ok = (uids >= 0) & (slots >= 0)
    safe = jnp.where(ok, slots, 0)

    def body(gb, i):
        gb = rec.gist_bank_add(
            gb, jnp.where(ok[i], slots[i], -1), delta.n_gist[i],
            delta.n_stamp[i],
        )
        return gb, None

    gist, _ = jax.lax.scan(body, state.gist, jnp.arange(uids.shape[0]))
    state = state._replace(gist=gist)

    # Empty payloads never clobber: a local instance re-ships boundary
    # anchors it received from scope replies (their local banks are empty),
    # and those must not wipe the global's real sensor data. Ineligible
    # rows scatter to an OOB index and drop (never to slot 0).
    if delta.n_desc is not None:
        f = delta.n_desc.shape[1]
        has_payload = ok & jnp.any(delta.n_desc_valid, axis=-1)
        wslot = jnp.where(has_payload, slots, graph.node_capacity)
        # bank may hold more rows than the shipped budget: fill the front
        fresh = has_payload & ~jnp.any(state.desc_valid[safe], axis=-1)
        state = state._replace(
            desc=state.desc.at[wslot, :f].set(delta.n_desc, mode="drop"),
            desc_valid=state.desc_valid.at[wslot, :f].set(
                delta.n_desc_valid, mode="drop"
            ),
            points=state.points.at[wslot, :f].set(delta.n_points, mode="drop"),
        )
    else:
        fresh = jnp.zeros_like(ok)
    if delta.n_scan is not None:
        sslot = jnp.where(ok & delta.n_scan_valid, slots, graph.node_capacity)
        state = state._replace(
            scans=state.scans.at[sslot].set(delta.n_scan, mode="drop"),
            scan_valid=state.scan_valid.at[sslot].set(True, mode="drop"),
        )
    return state, slots, fresh


def _grow_ship(ship: scope.ShipState, ncap: int, ecap: int) -> scope.ShipState:
    """Re-pad ACK masks after local graph growth (new slots un-ACKed)."""
    def pad(a, cap):
        if a.shape[0] >= cap:
            return a
        return jnp.concatenate([a, jnp.zeros((cap - a.shape[0],), bool)])

    return scope.ShipState(
        node_acked=pad(ship.node_acked, ncap),
        edge_acked=pad(ship.edge_acked, ecap),
    )


def _remap_ship(ship: scope.ShipState, perm: dict) -> scope.ShipState:
    """Remap ACK masks through a compaction permutation."""
    return scope.ShipState(
        node_acked=ship.node_acked[perm["node_order"]],
        edge_acked=ship.edge_acked[perm["edge_order"]] & perm["edge_kept"],
    )


def global_exchange_step(
    gslam: "pipeline.Slam",
    delta: scope.GraphDelta,
    robot,
    radius,
    delta_nodes: int = 32,
    delta_edges: int = 64,
    optimize: bool = True,
    uid_map=None,
):
    """The GLOBAL role's half of one protocol round, transport-agnostic.

    Takes a received ``GraphDelta`` + the local robot pose/scope radius
    (the ``/sub_graph`` + ``/request_scope`` inputs) and returns
    ``(ack, reply, info)`` (the ``/graph_received`` + ``/scope_graph``
    outputs).  Used by the in-process ``LocalGlobalSlam`` AND by the
    cross-process server (``tests/test_scope_transport.py``) — the same
    function body runs on either side of an OS boundary, which is what
    "transport is the caller's choice" means concretely.
    """
    # grow the global before applying: a dropped insert would stall the
    # resend loop until capacity appears
    need_n = int(jax.device_get(gslam.state.graph.num_nodes)) + delta_nodes
    need_e = int(jax.device_get(gslam.state.graph.num_edges)) + delta_edges
    if (need_n >= int(0.9 * gslam.config.node_capacity)
            or need_e >= int(0.9 * gslam.config.edge_capacity)):
        new_cfg = dataclasses.replace(
            gslam.config,
            node_capacity=max(gslam.config.node_capacity * 2, 64),
            edge_capacity=max(gslam.config.edge_capacity * 2, 256),
        )
        gslam.state = pipeline.grow_state(
            gslam.state, new_cfg.node_capacity, new_cfg.edge_capacity
        )
        gslam.config = new_cfg

    # host-side native uid->slot hashmap (runtime/native.py UidMap): one
    # O(Dn) hash probe replaces apply_delta's per-row O(N) masked scans —
    # at a 100k-node global the scans are the dominant delta-apply cost
    existing = None
    if uid_map is not None:
        existing = uid_map.lookup_batch(
            np.asarray(jax.device_get(delta.n_uid), np.int32)
        )
    gg, ack = scope.apply_delta(gslam.state.graph, delta, existing_slots=existing)
    if uid_map is not None:
        uids = np.asarray(jax.device_get(ack.node_uids), np.int32)
        slots_np = np.asarray(
            jax.device_get(scope.uid_to_slot(gg, ack.node_uids)), np.int32
        )
        m = (uids >= 0) & (slots_np >= 0)
        uid_map.insert_batch(uids[m], slots_np[m])
    gstate_, slots, fresh = _absorb_payloads_jit(
        gslam.state._replace(graph=gg), delta
    )
    # the global re-runs its PR on received nodes and proposes edges
    # from the shipped features (graph_slam_node.cpp:473-476)
    gstate_, n_proposed = pipeline.recognize_absorbed(
        gstate_, slots, fresh, gslam.config
    )
    gslam.state = gstate_

    reply = scope.scope_reply(gslam.state.graph, robot, radius)
    info_g = gslam.maintain(center=robot)
    if uid_map is not None and (
        int(jax.device_get(info_g["merged"])) > 0
        or info_g["compact_perm"] is not None
    ):
        # merges invalidate slots and compaction permutes them — rebuild
        # the host map from the authoritative graph arrays
        gg2 = gslam.state.graph
        valid = np.asarray(jax.device_get(gg2.node_valid))
        uids2 = np.asarray(jax.device_get(gg2.node_uid), np.int32)
        live = np.nonzero(valid)[0].astype(np.int32)
        uid_map.clear()
        uid_map.insert_batch(uids2[live], live)
    if optimize:
        gslam.optimize()
    info = {
        "merged_global": int(jax.device_get(info_g["merged"])),
        "proposed_global": int(jax.device_get(n_proposed)),
    }
    return ack, reply, info


class LocalGlobalSlam:
    """Two `pipeline.Slam` instances + the scope protocol as one runner.

    Drive with ``add_frame`` (feeds the local instance); call ``exchange``
    on the scope-timer cadence (the reference's 1 Hz scope request +
    per-batch delta shipping); the global map is ``self.global_slam``.
    """

    def __init__(self, config: SlamConfig | None = None, cam=None,
                 cam_pose=None, delta_nodes: int = 32, delta_edges: int = 64,
                 feat_budget: int | None = None):
        base = config or SlamConfig()
        self.local = pipeline.Slam(local_config(base), cam=cam, cam_pose=cam_pose)
        self.global_slam = pipeline.Slam(global_config(base), cam=cam, cam_pose=cam_pose)
        self.ship = scope.ship_state_init(self.local.state.graph)
        self.delta_nodes = delta_nodes
        self.delta_edges = delta_edges
        # host-side uid->slot hashmap for the GLOBAL graph (native
        # runtime; python-dict fallback) — spares apply_delta its per-row
        # O(N) uid scans on big global graphs
        from uzliti_slam_tpu.runtime import native
        self.guid_map = native.UidMap()
        # descriptor rows shipped per node (None = the full bank) — the
        # wire-size budget of the Node.msg SensorDataArray payload
        self.feat_budget = feat_budget
        self._last_robot_pose = None

    # -- ingestion (local role) -------------------------------------------

    def add_frame(self, image, depth, odom_pose, stamp, **kw):
        return self.local.add_frame(image, depth, odom_pose, stamp, **kw)

    # -- the exchange epoch (scope timers) ---------------------------------

    def exchange(self, optimize_global: bool = True) -> dict:
        """One full protocol round:

        1. ship un-ACKed local nodes/edges → global upserts → ACK back
        2. local requests scope → global replies fixed boundary nodes
        3. local evicts shipped out-of-scope nodes (+ slot reclamation)
        4. global merges revisited-area nodes and (optionally) optimizes
        """
        # 1. local packs the delta + scope request
        delta, robot, radius = self.local_make_request()

        # 2. global half (same function the cross-process server runs)
        ack, reply, info_g = global_exchange_step(
            self.global_slam, delta, robot, radius,
            self.delta_nodes, self.delta_edges, optimize=optimize_global,
            uid_map=self.guid_map,
        )

        # 3. local absorbs the ACK + boundary reply, evicts, compacts
        info_l = self.local_apply_response(ack, reply)
        return {**info_l, **info_g}

    def local_make_request(self):
        """LOCAL half, outbound: the un-ACKed delta (``/sub_graph``) plus
        the scope request's robot pose + adaptive radius
        (``/request_scope``, ``graph_slam_node.cpp:578-617``)."""
        lg = self.local.state.graph
        self.ship = _grow_ship(self.ship, lg.node_capacity, lg.edge_capacity)
        ls = self.local.state
        delta = scope.make_delta(
            lg, self.ship, ls.gist.desc,
            max_nodes=self.delta_nodes, max_edges=self.delta_edges,
            desc=ls.desc, desc_valid=ls.desc_valid, points=ls.points,
            scans=ls.scans, scan_valid=ls.scan_valid,
            feat_budget=self.feat_budget,
            sensor_transforms=(
                self.local.cam_pose if self.local.cam_pose.ndim == 2
                else self.local.cam_pose[None]
            ),
        )
        # Robot pose = map-frame estimate of the latest keyframe odometry
        # (graph_slam_node.cpp:188-202) — stays on device, no frame-path sync
        robot = lg.pose[jnp.maximum(ls.last_kf_slot, 0)]
        sc = self.local.config.scope
        radius = lifecycle.scope_radius(
            lg.uncertainty[jnp.maximum(ls.last_kf_slot, 0)],
            sc.scope_size_min, sc.scope_size_factor,
        )
        return delta, robot, radius

    def local_apply_response(self, ack: scope.Ack, reply: scope.ScopeReply):
        """LOCAL half, inbound: mark ACKed entries, merge fixed boundary
        nodes, evict shipped out-of-scope nodes, reclaim slots."""
        lg = self.local.state.graph
        self.ship = scope.apply_ack(lg, self.ship, ack)
        n_acked = int(jax.device_get(jnp.sum(ack.node_uids >= 0)))
        self.local.state = self.local.state._replace(
            graph=scope.apply_scope(self.local.state.graph, reply)
        )
        info_l = self.local.maintain(shipped=self.ship.node_acked)
        if info_l["compact_perm"] is not None:
            self.ship = _remap_ship(self.ship, info_l["compact_perm"])
        return {
            "acked_nodes": n_acked,
            "evicted_local": int(jax.device_get(info_l["evicted"])),
        }

    # -- results ------------------------------------------------------------


    def global_trajectory(self):
        g = self.global_slam.state.graph
        n = int(jax.device_get(g.num_nodes))
        valid = np.asarray(g.node_valid[:n])
        return (
            np.asarray(g.pose[:n])[valid],
            np.asarray(g.node_uid[:n])[valid],
            np.asarray(g.stamp[:n])[valid],
        )
