"""Graph lifecycle: keyframe triggers, scope windowing, node merging, growth.

Re-designs of the reference's node-management heuristics:

- Keyframe trigger: new node when moved ≥ 0.3 m or ≥ 10-20°
  (``graph_slam_node.cpp:178``, ``GraphSlam.cfg:9-10``).
- Scope window: the local graph keeps only nodes within
  ``max(scope_size_min, scope_size_factor · uncertainty)`` of the robot;
  the rest are evicted after being shipped (``graph_slam_node.cpp:586,
  619-660``).
- Node merging: revisited-area densification control — nearby node pairs
  (< 0.25 m, < 15°) outside the active scope merge into one node with a
  slerp-averaged pose; edges are rewired with displacement rewrite and
  self-loops dropped (``graph_slam_node.cpp:665-777, 890-1062``).
- Capacity growth: host-side re-padding to the next tier so jitted shapes
  stay static (SURVEY.md §7 "recompilation-free growth tiers").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


def keyframe_due(
    last_pose: jax.Array,
    current_pose: jax.Array,
    dist_thresh: float = 0.3,
    angle_thresh_deg: float = 10.0,
) -> jax.Array:
    """True when motion since the last keyframe exceeds the thresholds."""
    dt, dr = lie.pose_distance(last_pose, current_pose)
    return (dt >= dist_thresh) | (jnp.degrees(dr) >= angle_thresh_deg)


def scope_radius(
    uncertainty: jax.Array,
    scope_size_min: float = 8.0,
    scope_size_factor: float = 0.1,
) -> jax.Array:
    """Adaptive local-scope radius (``graph_slam_node.cpp:586``)."""
    return jnp.maximum(scope_size_min, scope_size_factor * uncertainty)


def out_of_scope_mask(
    g: GraphState,
    center: jax.Array,
    radius: jax.Array,
    margin: float = 4.0,
    shipped: jax.Array | None = None,
) -> jax.Array:
    """Nodes eligible for eviction: valid, outside radius+margin of the
    robot, and already shipped/ACKed to the global graph
    (``graph_slam_node.cpp:619-660``)."""
    from uzliti_slam_tpu.graph.state import GPS_ANCHOR_UID

    d = jnp.linalg.norm(lie.pose_t(g.pose) - lie.pose_t(center)[None], axis=-1)
    mask = g.node_valid & (d > radius + margin) & (g.node_uid != GPS_ANCHOR_UID)
    if shipped is not None:
        mask &= shipped
    return mask


def evict_nodes(g: GraphState, evict: jax.Array) -> GraphState:
    """Invalidate evicted nodes and every edge touching them."""
    edge_dead = evict[g.e_from] | evict[g.e_to]
    return g._replace(
        node_valid=g.node_valid & ~evict,
        node_fixed=g.node_fixed & ~evict,
        e_valid=g.e_valid & ~edge_dead,
    )


def find_merge_pairs(
    g: GraphState,
    center: jax.Array,
    radius: jax.Array,
    dist_thresh: float = 0.25,
    angle_thresh_deg: float = 15.0,
    margin: float = 6.0,
    max_pairs: int = 16,
):
    """Candidate (keep, absorb) node pairs: close in pose, both outside the
    active scope (``graph_slam_node.cpp:740-747``). Keep = older node.

    Returns (keep_idx, absorb_idx, ok) each (max_pairs,). Greedy conflict
    avoidance: each node appears in at most one pair.
    """
    n = g.node_capacity
    d_center = jnp.linalg.norm(lie.pose_t(g.pose) - lie.pose_t(center)[None], axis=-1)
    eligible = g.node_valid & (d_center > radius + margin)

    dt = jnp.linalg.norm(
        lie.pose_t(g.pose)[:, None] - lie.pose_t(g.pose)[None, :], axis=-1
    )
    rel_q = lie.quat_mul(
        lie.quat_conj(lie.pose_q(g.pose))[:, None], lie.pose_q(g.pose)[None, :]
    )
    dr = jnp.degrees(lie.rotation_angle(rel_q))
    older = g.stamp[:, None] < g.stamp[None, :]
    close = (
        (dt < dist_thresh)
        & (dr < angle_thresh_deg)
        & eligible[:, None]
        & eligible[None, :]
        & older  # orient pairs: keep=i (older), absorb=j (newer)
    )

    # Greedy one-pair-per-node: pick up to max_pairs by smallest distance.
    score = jnp.where(close, dt, jnp.inf)
    flat = score.reshape(-1)

    def pick(carry, _):
        flat_cur, used = carry
        best = jnp.argmin(flat_cur)
        val = flat_cur[best]
        i = best // n
        j = best % n
        ok = jnp.isfinite(val) & ~used[i] & ~used[j]
        used = used.at[i].set(used[i] | ok).at[j].set(used[j] | ok)
        # invalidate row/col of both nodes
        mask_i = (jnp.arange(n * n) // n == i) | (jnp.arange(n * n) % n == i)
        mask_j = (jnp.arange(n * n) // n == j) | (jnp.arange(n * n) % n == j)
        flat_cur = jnp.where(mask_i | mask_j, jnp.inf, flat_cur)
        return (flat_cur, used), (i.astype(jnp.int32), j.astype(jnp.int32), ok)

    (_, _), (ki, ai, ok) = jax.lax.scan(
        pick, (flat, jnp.zeros(n, dtype=bool)), None, length=max_pairs
    )
    return ki, ai, ok


def merge_nodes(g: GraphState, keep: jax.Array, absorb: jax.Array, ok: jax.Array) -> GraphState:
    """Merge each (keep, absorb) pair: slerp-average the kept pose, rewire
    the absorbed node's edges with displacement rewrite, drop self-loops
    (``graph_slam_node.cpp:890-1062``; remap ``slam_graph.cpp:191-195``)."""
    n = g.node_capacity

    # remap: absorb -> keep (single level; pairs are disjoint by
    # construction)
    remap = jnp.arange(n, dtype=jnp.int32)
    remap = remap.at[jnp.where(ok, absorb, n - 1)].set(
        jnp.where(ok, keep, remap[jnp.where(ok, absorb, n - 1)]), mode="drop"
    )

    # averaged pose at the kept slot
    pose_keep = g.pose[jnp.where(ok, keep, 0)]
    pose_abs = g.pose[jnp.where(ok, absorb, 0)]
    avg = lie.pose_interpolate(pose_keep, pose_abs, 0.5)
    new_pose = g.pose.at[jnp.where(ok, keep, n - 1)].set(
        jnp.where(ok[:, None], avg, g.pose[jnp.where(ok, keep, n - 1)]), mode="drop"
    )

    # displacement rewrite relative to the NEW kept pose:
    # from-side: T_new = (pose_new^-1 ∘ pose_old_endpoint) ∘ T_old
    old_pose_all = g.pose
    ef_new = remap[g.e_from]
    et_new = remap[g.e_to]
    disp_from = lie.pose_relative(new_pose[ef_new], old_pose_all[g.e_from])
    disp_to = lie.pose_relative(old_pose_all[g.e_to], new_pose[et_new])
    changed_f = ef_new != g.e_from
    changed_t = et_new != g.e_to
    # also nodes whose own pose moved (kept slots) shift their edges
    moved = jnp.zeros(n, dtype=bool).at[jnp.where(ok, keep, n - 1)].set(ok, mode="drop")
    adj_f = changed_f | moved[g.e_from]
    adj_t = changed_t | moved[g.e_to]
    T = g.e_transform
    T = jnp.where(adj_f[:, None], lie.pose_compose(disp_from, T), T)
    T = jnp.where(adj_t[:, None], lie.pose_compose(T, disp_to), T)

    self_loop = ef_new == et_new
    absorbed_mask = jnp.zeros(n, dtype=bool).at[jnp.where(ok, absorb, n - 1)].set(ok, mode="drop")

    return g._replace(
        pose=new_pose,
        e_from=ef_new,
        e_to=et_new,
        e_transform=T,
        e_valid=g.e_valid & ~self_loop,
        node_valid=g.node_valid & ~absorbed_mask,
        merged_into=remap[g.merged_into],
        # keep earliest stamp at kept slot: kept node is older by pairing
    )


def merge_step(
    g: GraphState,
    center: jax.Array,
    radius: jax.Array,
    **kwargs,
) -> tuple[GraphState, jax.Array]:
    """One merge epoch (the reference's ``mergeTimerCallback``). Returns
    (graph, number_of_merges)."""
    ki, ai, ok = find_merge_pairs(g, center, radius, **kwargs)
    g = merge_nodes(g, ki, ai, ok)
    return g, jnp.sum(ok)


def compact_graph(g: GraphState) -> tuple[GraphState, dict]:
    """Slot reclamation: permute live nodes/edges to the front so the
    high-water marks shrink to the live counts and ``add_node``/``add_edge``
    can reuse freed capacity.

    The reference actually frees map entries on ``removeNode``
    (``slam_graph.cpp:216-229``) and relies on that for bounded local
    scopes (eviction, ``graph_slam_node.cpp:619-660``); the SoA analog is
    periodic compaction — append-only insertion stays O(1) and jit sees
    only static shapes. Stable order, so the newest node remains the last
    live slot (``pipeline`` depends on ``num_nodes - 1`` being newest).

    Returns (graph, perm) where perm carries the node/edge permutations for
    remapping slot-aligned side tables (feature banks, ship/ACK masks):

    - ``node_order`` (N,): old slot stored at each new slot
    - ``node_inv``   (N,): new slot of each old slot, -1 if dead
    - ``edge_order`` (E,): old edge slot at each new slot
    - ``edge_kept``  (E,): whether the edge at new slot survived
    """
    n = g.node_capacity
    e = g.edge_capacity
    valid = g.node_valid
    node_order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    n_live = jnp.sum(valid).astype(jnp.int32)
    pos = jnp.zeros((n,), jnp.int32).at[node_order].set(jnp.arange(n, dtype=jnp.int32))
    node_inv = jnp.where(valid, pos, -1)

    def nperm(a):
        return a[node_order]

    # merged_into: old slot -> live old slot; re-express in new slots
    mi = node_inv[g.merged_into[node_order]]
    new_idx = jnp.arange(n, dtype=jnp.int32)
    mi = jnp.where((mi >= 0) & nperm(valid), mi, new_idx)

    # edges: keep in-table edges whose endpoints are both live (dropped
    # edges include still-invalid pending closures of dead nodes — an
    # evicted endpoint can never validate them)
    in_table = jnp.arange(e) < g.num_edges
    keep = in_table & valid[g.e_from] & valid[g.e_to]
    edge_order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    e_live = jnp.sum(keep).astype(jnp.int32)
    kept = keep[edge_order]

    def eperm(a, fill=0):
        out = a[edge_order]
        shape_ones = (1,) * (a.ndim - 1)
        return jnp.where(kept.reshape((-1,) + shape_ones), out, fill)

    ef = jnp.maximum(node_inv[g.e_from[edge_order]], 0)
    et = jnp.maximum(node_inv[g.e_to[edge_order]], 0)
    ident = jnp.zeros((7,)).at[3].set(1.0)

    g2 = g._replace(
        pose=nperm(g.pose),
        odom_pose=nperm(g.odom_pose),
        stamp=nperm(g.stamp),
        uncertainty=nperm(g.uncertainty),
        node_valid=nperm(valid),
        node_fixed=nperm(g.node_fixed),
        merged_into=mi,
        node_uid=jnp.where(nperm(valid), nperm(g.node_uid), -1),
        e_from=jnp.where(kept, ef, 0),
        e_to=jnp.where(kept, et, 0),
        e_transform=jnp.where(kept[:, None], g.e_transform[edge_order], ident),
        e_info=eperm(g.e_info),
        e_type=eperm(g.e_type),
        e_valid=kept & g.e_valid[edge_order],
        e_error=eperm(g.e_error),
        e_age=eperm(g.e_age),
        e_score=eperm(g.e_score),
        num_nodes=n_live,
        num_edges=e_live,
    )
    perm = {
        "node_order": node_order,
        "node_inv": node_inv,
        "edge_order": edge_order,
        "edge_kept": kept,
    }
    return g2, perm


def ensure_capacity(
    g: GraphState, min_nodes: int, min_edges: int, growth: float = 2.0
) -> GraphState:
    """Host-side growth: re-pad to the next capacity tier when the used
    count approaches capacity. NOT jit-safe (changes shapes); call between
    jitted steps."""
    ncap = g.node_capacity
    ecap = g.edge_capacity
    new_n = ncap
    new_e = ecap
    while new_n < min_nodes:
        new_n = int(new_n * growth)
    while new_e < min_edges:
        new_e = int(new_e * growth)
    if new_n == ncap and new_e == ecap:
        return g

    def pad_to(arr, cap, axis0):
        pad = cap - arr.shape[0]
        if pad <= 0:
            return arr
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths)

    node_fields = dict(
        pose=pad_to(g.pose, new_n, 0),
        odom_pose=pad_to(g.odom_pose, new_n, 0),
        stamp=pad_to(g.stamp, new_n, 0),
        uncertainty=pad_to(g.uncertainty, new_n, 0),
        node_valid=pad_to(g.node_valid, new_n, 0),
        node_fixed=pad_to(g.node_fixed, new_n, 0),
        merged_into=jnp.concatenate(
            [g.merged_into, jnp.arange(ncap, new_n, dtype=jnp.int32)]
        ) if new_n > ncap else g.merged_into,
        node_uid=jnp.concatenate(
            [g.node_uid, jnp.full((new_n - ncap,), -1, dtype=jnp.int32)]
        ) if new_n > ncap else g.node_uid,
    )
    # identity poses in padding
    if new_n > ncap:
        node_fields["pose"] = node_fields["pose"].at[ncap:, 3].set(1.0)
        node_fields["odom_pose"] = node_fields["odom_pose"].at[ncap:, 3].set(1.0)

    edge_fields = dict(
        e_from=pad_to(g.e_from, new_e, 0),
        e_to=pad_to(g.e_to, new_e, 0),
        e_transform=pad_to(g.e_transform, new_e, 0),
        e_info=pad_to(g.e_info, new_e, 0),
        e_type=pad_to(g.e_type, new_e, 0),
        e_valid=pad_to(g.e_valid, new_e, 0),
        e_error=pad_to(g.e_error, new_e, 0),
        e_age=pad_to(g.e_age, new_e, 0),
        e_score=pad_to(g.e_score, new_e, 0),
    )
    if new_e > ecap:
        edge_fields["e_transform"] = edge_fields["e_transform"].at[ecap:, 3].set(1.0)

    return g._replace(**node_fields, **edge_fields)
