"""Struct-of-arrays pose-graph state.

TPU-native replacement for the reference's pointer-heavy, string-keyed
``SlamGraph`` (reference ``graph_slam_common/include/graph_slam_common/
slam_graph.h:45-190``): fixed-capacity padded arrays + validity masks,
int32 node slots instead of string UUIDs, advanced by pure jitted
functions.  Dynamic growth happens host-side by re-padding to the next
capacity tier (so jit never sees a dynamic shape).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import lie


# Edge types — mirrors the reference wire schema
# (``graph_slam_msgs/msg/Edge.msg:1-38``).
EDGE_TYPE_3D_FULL = 1
EDGE_TYPE_3D_ROTATION = 2
EDGE_TYPE_3D_TRANSLATION = 3
EDGE_TYPE_3D_GPS = 4
EDGE_TYPE_2D_FULL = 5
EDGE_TYPE_2D_ROTATION = 6
EDGE_TYPE_2D_TRANSLATION = 7
EDGE_TYPE_2D_WHEEL_ODOMETRY = 104
EDGE_TYPE_2D_LASER = 105

# uid reserved for the GPS map-origin anchor node (outside the
# instance_id*1e6 + keyframe-counter space of any instance); exempt from
# scope eviction — evicting it would orphan every TYPE_3D_GPS factor
GPS_ANCHOR_UID = 2_000_000_000


class GraphState(NamedTuple):
    """Fixed-capacity pose graph. All arrays padded to (N,) / (E,) capacity.

    Invalid slots carry identity poses / zero info so every kernel can run
    unmasked over full arrays and mask only at reductions.
    """

    # --- nodes (capacity N) ---
    pose: jax.Array          # (N, 7) map-frame pose [t, q]
    odom_pose: jax.Array     # (N, 7) odometry-frame pose (reference sub_pose_)
    stamp: jax.Array         # (N,) seconds
    uncertainty: jax.Array   # (N,) accumulated path uncertainty
    node_valid: jax.Array    # (N,) bool
    node_fixed: jax.Array    # (N,) bool — gauge/boundary anchors
    merged_into: jax.Array   # (N,) int32 — slot remap after merges (self id if live)
    node_uid: jax.Array      # (N,) int32 — globally-unique node id (stable
                             # across local/global instances; the TPU-native
                             # replacement for the reference's string UUIDs)

    # --- edges (capacity E) ---
    e_from: jax.Array        # (E,) int32 node slot
    e_to: jax.Array          # (E,) int32 node slot
    e_transform: jax.Array   # (E, 7) measured relative pose from->to
    e_info: jax.Array        # (E, 6, 6) information matrix
    e_type: jax.Array        # (E,) int32
    e_valid: jax.Array       # (E,) bool
    e_error: jax.Array       # (E,) chi2 error after last solve
    e_age: jax.Array         # (E,) optimization epochs since creation
    e_score: jax.Array       # (E,) matching score (RANSAC consensus etc.)

    # --- scalars ---
    num_nodes: jax.Array     # () int32 — high-water mark of used node slots
    num_edges: jax.Array     # () int32
    diff_transform: jax.Array  # (7,) map->odom correction (reference diffTransform)
    # odometry calibration parameters [trans_scale, yaw_per_rad, yaw_per_m]
    # — the reference's SlamGraph odometry parameters, shipped in every
    # Graph.msg (``graph_slam_msgs/msg/Graph.msg:1-10``) and applied to
    # odometry-edge measurements inside the optimizer
    # (``g2o_optimizer.cpp:209-227``). Nominal = [1, 0, 0].
    odom_params: jax.Array   # (3,)

    @property
    def node_capacity(self) -> int:
        return self.pose.shape[0]

    @property
    def edge_capacity(self) -> int:
        return self.e_from.shape[0]


def empty_graph(node_capacity: int, edge_capacity: int) -> GraphState:
    n, e = node_capacity, edge_capacity
    return GraphState(
        pose=lie.pose_identity((n,)),
        odom_pose=lie.pose_identity((n,)),
        stamp=jnp.zeros((n,)),
        uncertainty=jnp.zeros((n,)),
        node_valid=jnp.zeros((n,), dtype=bool),
        node_fixed=jnp.zeros((n,), dtype=bool),
        merged_into=jnp.arange(n, dtype=jnp.int32),
        node_uid=jnp.full((n,), -1, dtype=jnp.int32),
        e_from=jnp.zeros((e,), dtype=jnp.int32),
        e_to=jnp.zeros((e,), dtype=jnp.int32),
        e_transform=lie.pose_identity((e,)),
        e_info=jnp.zeros((e, 6, 6)),
        e_type=jnp.zeros((e,), dtype=jnp.int32),
        e_valid=jnp.zeros((e,), dtype=bool),
        e_error=jnp.zeros((e,)),
        e_age=jnp.zeros((e,)),
        e_score=jnp.zeros((e,)),
        num_nodes=jnp.zeros((), dtype=jnp.int32),
        num_edges=jnp.zeros((), dtype=jnp.int32),
        diff_transform=lie.pose_identity(),
        odom_params=jnp.array([1.0, 0.0, 0.0]),
    )


def add_node(
    g: GraphState,
    pose: jax.Array,
    odom_pose: jax.Array,
    stamp: jax.Array,
    fixed: bool | jax.Array = False,
    uncertainty: jax.Array | float = 0.0,
    uid: jax.Array | int | None = None,
) -> tuple[GraphState, jax.Array]:
    """Append a node at the next free slot. Returns (graph, slot).

    If capacity is exhausted the write is dropped (slot == -1); the host
    runtime is responsible for growing capacity before that happens
    (see ``lifecycle.ensure_capacity``).
    """
    slot = g.num_nodes
    ok = slot < g.node_capacity
    idx = jnp.where(ok, slot, 0)  # clamp for safe scatter; masked below

    def wr(arr, val):
        return arr.at[idx].set(jnp.where(ok, val, arr[idx]))

    g = g._replace(
        pose=wr(g.pose, pose),
        odom_pose=wr(g.odom_pose, odom_pose),
        stamp=wr(g.stamp, stamp),
        uncertainty=wr(g.uncertainty, jnp.asarray(uncertainty, dtype=g.uncertainty.dtype)),
        node_valid=wr(g.node_valid, jnp.asarray(ok)),
        node_fixed=wr(g.node_fixed, jnp.asarray(fixed, dtype=bool)),
        node_uid=wr(
            g.node_uid,
            jnp.asarray(slot if uid is None else uid, dtype=jnp.int32),
        ),
        num_nodes=g.num_nodes + jnp.where(ok, 1, 0).astype(jnp.int32),
    )
    return g, jnp.where(ok, slot, -1)


def add_edge(
    g: GraphState,
    from_slot: jax.Array,
    to_slot: jax.Array,
    transform: jax.Array,
    info: jax.Array,
    etype: int | jax.Array = EDGE_TYPE_3D_FULL,
    score: jax.Array | float = 0.0,
    valid: bool | jax.Array = True,
) -> tuple[GraphState, jax.Array]:
    """Append an edge. Returns (graph, slot). Dropped if capacity full.

    The information matrix is masked by edge type at insertion
    (``info_for_edge_type``) so partial-constraint semantics — rotation-only
    / translation-only / GPS / planar edge types — are ENFORCED everywhere
    downstream (chi2, solve, filter) from one place."""
    info = info_for_edge_type(jnp.asarray(etype), info)
    slot = g.num_edges
    ok = (slot < g.edge_capacity) & (from_slot >= 0) & (to_slot >= 0)
    idx = jnp.where(ok, slot, 0)

    def wr(arr, val):
        return arr.at[idx].set(jnp.where(ok, val, arr[idx]))

    g = g._replace(
        e_from=wr(g.e_from, from_slot.astype(jnp.int32)),
        e_to=wr(g.e_to, to_slot.astype(jnp.int32)),
        e_transform=wr(g.e_transform, transform),
        e_info=wr(g.e_info, info),
        e_type=wr(g.e_type, jnp.asarray(etype, dtype=jnp.int32)),
        e_valid=wr(g.e_valid, jnp.asarray(valid) & ok),
        e_error=wr(g.e_error, 0.0),
        e_age=wr(g.e_age, 0.0),
        e_score=wr(g.e_score, jnp.asarray(score, dtype=g.e_score.dtype)),
        num_edges=g.num_edges + jnp.where(ok, 1, 0).astype(jnp.int32),
    )
    return g, jnp.where(ok, slot, -1)


def odometry_information(rel_pose: jax.Array, dt: jax.Array | float = 0.1) -> jax.Array:
    """Motion-dependent odometry information model.

    Re-design of the reference's hand-tuned model (reference
    ``graph_slam/src/graph_slam_node.cpp:316-336``): confidence shrinks
    with distance travelled and angle turned; rotation block stiffer than
    translation.
    """
    dist = jnp.linalg.norm(lie.pose_t(rel_pose), axis=-1)
    ang = lie.rotation_angle(lie.pose_q(rel_pose))
    trans_sigma = 0.02 + 0.1 * dist + 0.05 * ang
    rot_sigma = 0.01 + 0.05 * dist + 0.1 * ang
    w = jnp.concatenate(
        [
            jnp.broadcast_to((1.0 / trans_sigma**2)[..., None], rel_pose.shape[:-1] + (3,)),
            jnp.broadcast_to((1.0 / rot_sigma**2)[..., None], rel_pose.shape[:-1] + (3,)),
        ],
        axis=-1,
    )
    return w[..., :, None] * jnp.eye(6)


def info_for_edge_type(etype: jax.Array, base_info: jax.Array) -> jax.Array:
    """Mask an information matrix by edge type.

    Implements the reference's partial-constraint edge types
    (``graph_slam_msgs/msg/Edge.msg`` enums; g2o flattening in
    ``graph_optimization/src/g2o_optimizer.cpp:164-188``): rotation-only /
    translation-only / planar variants keep only the relevant blocks.
    """
    d = jnp.ones((6,))
    trans_only = d.at[3:].set(0.0)
    rot_only = d.at[:3].set(0.0)
    planar = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0])  # x, y, yaw
    etype_b = jnp.asarray(etype)[..., None]  # broadcast against the 6-vector masks
    # NOTE: TYPE_2D_WHEEL_ODOMETRY keeps the FULL 6x6 — the reference's
    # odometry information model is a full identity-scaled matrix despite
    # the 2D type tag (graph_slam_node.cpp:316-321); 2D_FULL/2D_LASER are
    # planar by construction (the laser info already lives in x,y,yaw).
    mask = jnp.select(
        [
            (etype_b == EDGE_TYPE_3D_TRANSLATION) | (etype_b == EDGE_TYPE_3D_GPS),
            etype_b == EDGE_TYPE_3D_ROTATION,
            (etype_b == EDGE_TYPE_2D_FULL)
            | (etype_b == EDGE_TYPE_2D_LASER),
            etype_b == EDGE_TYPE_2D_ROTATION,
            etype_b == EDGE_TYPE_2D_TRANSLATION,
        ],
        [trans_only, rot_only, planar, d.at[:5].set(0.0), d.at[2:].set(0.0)],
        d,
    )
    return base_info * mask[..., :, None] * mask[..., None, :]
