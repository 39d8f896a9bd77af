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
def _absorb_gists_jit(gist, graph, uids, gists, stamps):
    slots = scope.uid_to_slot(graph, uids)

    def body(gb, i):
        gb = rec.gist_bank_add(
            gb, jnp.where(uids[i] >= 0, slots[i], -1), gists[i], stamps[i]
        )
        return gb, None

    gist, _ = jax.lax.scan(body, gist, jnp.arange(uids.shape[0]))
    return gist


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


class LocalGlobalSlam:
    """Two `pipeline.Slam` instances + the scope protocol as one runner.

    Drive with ``add_frame`` (feeds the local instance); call ``exchange``
    on the scope-timer cadence (the reference's 1 Hz scope request +
    per-batch delta shipping); the global map is ``self.global_slam``.
    """

    def __init__(self, config: SlamConfig | None = None, cam=None,
                 cam_pose=None, delta_nodes: int = 32, delta_edges: int = 64):
        base = config or SlamConfig()
        self.local = pipeline.Slam(local_config(base), cam=cam, cam_pose=cam_pose)
        self.global_slam = pipeline.Slam(global_config(base), cam=cam, cam_pose=cam_pose)
        self.ship = scope.ship_state_init(self.local.state.graph)
        self.delta_nodes = delta_nodes
        self.delta_edges = delta_edges
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
        lg = self.local.state.graph
        self.ship = _grow_ship(self.ship, lg.node_capacity, lg.edge_capacity)

        # grow the global before applying: a dropped insert would stall the
        # resend loop until capacity appears
        gslam = self.global_slam
        need_n = int(jax.device_get(gslam.state.graph.num_nodes)) + self.delta_nodes
        need_e = int(jax.device_get(gslam.state.graph.num_edges)) + self.delta_edges
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

        # 1. delta → global, ACK → local
        delta = scope.make_delta(
            lg, self.ship, self.local.state.gist.desc,
            max_nodes=self.delta_nodes, max_edges=self.delta_edges,
        )
        gg, ack = scope.apply_delta(gslam.state.graph, delta)
        gslam.state = self._absorb_gists(gslam.state._replace(graph=gg), delta)
        self.ship = scope.apply_ack(lg, self.ship, ack)
        n_acked = int(jax.device_get(jnp.sum(ack.node_uids >= 0)))

        # 2. scope request/reply: boundary nodes come back FIXED. Robot
        # pose = map-frame estimate of the latest keyframe odometry
        # (graph_slam_node.cpp:188-202) — stays on device, no frame-path sync
        robot = self.local.state.graph.pose[
            jnp.maximum(self.local.state.last_kf_slot, 0)
        ]
        sc = self.local.config.scope
        radius = lifecycle.scope_radius(
            self.local.state.graph.uncertainty[
                jnp.maximum(self.local.state.last_kf_slot, 0)
            ],
            sc.scope_size_min, sc.scope_size_factor,
        )
        reply = scope.scope_reply(gslam.state.graph, robot, radius)
        self.local.state = self.local.state._replace(
            graph=scope.apply_scope(self.local.state.graph, reply)
        )

        # 3. local eviction (only ACKed nodes leave) + slot reclamation
        info_l = self.local.maintain(shipped=self.ship.node_acked)
        if info_l["compact_perm"] is not None:
            self.ship = _remap_ship(self.ship, info_l["compact_perm"])

        # 4. global merge + solve
        info_g = self.global_slam.maintain(center=robot)
        if optimize_global:
            self.global_slam.optimize()
        return {
            "acked_nodes": n_acked,
            "evicted_local": int(jax.device_get(info_l["evicted"])),
            "merged_global": int(jax.device_get(info_g["merged"])),
        }

    def _absorb_gists(self, gstate_, delta: scope.GraphDelta):
        """Index shipped GIST payloads into the global PR bank (the
        reference re-runs PR on received nodes, ``:473-476``). One jitted
        scan — not a per-node dispatch loop."""
        return gstate_._replace(
            gist=_absorb_gists_jit(
                gstate_.gist, gstate_.graph, delta.n_uid, delta.n_gist,
                delta.n_stamp,
            )
        )

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
