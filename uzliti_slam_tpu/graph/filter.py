"""Loop-closure outlier rejection: edge-heuristic gate + spatio-temporal
cluster RANSAC.

Re-design of two reference mechanisms:

1. ``checkEdgeHeuristic`` (``graph_slam/src/graph_slam_node.cpp:1064-1085``):
   a candidate edge is plausible iff the current graph geodesic distance
   between its endpoints can explain their pose discrepancy —
   ``2·f·dist + 1 > ‖Δt‖`` and ``10·f·dist + 30° > Δθ``; unreachable
   endpoints are accepted.  Batched over candidates via multi-source
   Bellman-Ford (see ``shortest_path.py``).

2. ``TransformationFilter`` (``transformation_estimation/src/
   transformation_filter.cpp``): loop-closure edges are clustered by
   from/to-timestamp proximity (max_dt, cluster merging ``:138-201``);
   clusters with ≥ min_size edges spanning ≥ 2 s on both sides run a
   RANSAC-SVD over edge-endpoint world positions and only the consensus
   subset stays valid (``:216-285``); each cluster is then capped to the
   best + temporally spread edges (``:287-350``).  Here clustering is
   label propagation on the candidate-adjacency matrix and every cluster's
   RANSAC runs vmapped at once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph import shortest_path
from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie, ransac


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    max_dt: float = 5.0            # cluster stamp proximity (ctor default, g2o_optimizer.cpp:42-46)
    min_cluster_size: int = 5
    min_time_span: float = 2.0     # per side, transformation_filter.cpp:240-244
    max_error: float = 0.3         # RANSAC inlier radius, :268
    ransac_hypotheses: int = 128   # reference: 200 iterations, :270
    max_edges_per_cluster: int = 5  # validEdges cap, :287-350
    scope_size_factor: float = 0.1  # GraphSlam.cfg:34


def edge_heuristic(
    g: GraphState,
    cand_from: jax.Array,
    cand_to: jax.Array,
    scope_size_factor: float = 0.1,
    n_iters: int = 64,
) -> jax.Array:
    """Batched ``checkEdgeHeuristic``: (B,) bool plausibility per candidate."""
    dist = shortest_path.pairwise_graph_distance(g, cand_from, cand_to, n_iters)
    rel = lie.pose_relative(g.pose[cand_from], g.pose[cand_to])
    dt = jnp.linalg.norm(lie.pose_t(rel), axis=-1)
    dr_deg = jnp.degrees(lie.rotation_angle(lie.pose_q(rel)))
    reachable = dist < shortest_path.INF
    ok = (2.0 * scope_size_factor * dist + 1.0 > dt) & (
        10.0 * scope_size_factor * dist + 30.0 > dr_deg
    )
    return jnp.where(reachable, ok, True)


def _cluster_labels(stamp_from, stamp_to, valid, max_dt: float, n_iters: int = 16):
    """Spatio-temporal clustering via min-label propagation on the (B, B)
    adjacency: edges i, j belong together iff both endpoint stamps are
    within max_dt."""
    adj = (
        (jnp.abs(stamp_from[:, None] - stamp_from[None, :]) < max_dt)
        & (jnp.abs(stamp_to[:, None] - stamp_to[None, :]) < max_dt)
        & valid[:, None]
        & valid[None, :]
    )
    b = stamp_from.shape[0]
    labels0 = jnp.where(valid, jnp.arange(b, dtype=jnp.int32), b)

    def body(_, labels):
        neigh = jnp.where(adj, labels[None, :], b)
        return jnp.minimum(labels, jnp.min(neigh, axis=-1))

    return jax.lax.fori_loop(0, n_iters, body, labels0)


def filter_loop_closures(
    g: GraphState,
    cand_idx: jax.Array,
    key: jax.Array,
    config: FilterConfig = FilterConfig(),
    cand_mask: jax.Array | None = None,
) -> jax.Array:
    """Validate candidate loop-closure edges (edge-table indices ``cand_idx``,
    shape (B,) with -1 padding). Returns (B,) bool: which stay valid.

    ``cand_mask`` (B,) selects which candidates participate (e.g. the
    plausibility-heuristic survivors); default = the edges' current
    validity. Candidates with an invalid endpoint node are always
    excluded — an evicted/merged node must never anchor a revived edge.

    Pipeline: endpoint world positions under the current estimate → cluster
    by stamps → per-cluster RANSAC over (predicted, actual) endpoint
    positions → consensus mask → per-cluster cap of best + spread edges.
    """
    b = cand_idx.shape[0]
    present = cand_idx >= 0
    ci = jnp.where(present, cand_idx, 0)

    ef = g.e_from[ci]
    et = g.e_to[ci]
    valid = present & (g.e_valid[ci] if cand_mask is None else cand_mask)
    valid &= g.node_valid[ef] & g.node_valid[et]

    # Predicted position of the 'to' node via the edge vs its actual
    # position (transformation_filter.cpp:246-260, sensor composition is
    # already folded into e_transform at construction).
    p_pred = lie.pose_t(lie.pose_compose(g.pose[ef], g.e_transform[ci]))
    p_act = lie.pose_t(g.pose[et])
    sf = g.stamp[ef]
    st = g.stamp[et]

    labels = _cluster_labels(sf, st, valid, config.max_dt)

    # Per-cluster stats (label ids are candidate indices; capacity b+1).
    ones = valid.astype(jnp.int32)
    seg = lambda x, op, init: op(
        jnp.where(valid, x, init), labels, num_segments=b + 1
    )
    csize = jax.ops.segment_sum(ones, labels, num_segments=b + 1)
    f_min = seg(sf, jax.ops.segment_min, jnp.inf)
    f_max = seg(sf, jax.ops.segment_max, -jnp.inf)
    t_min = seg(st, jax.ops.segment_min, jnp.inf)
    t_max = seg(st, jax.ops.segment_max, -jnp.inf)
    runs = (
        (csize >= config.min_cluster_size)
        & ((f_max - f_min) >= config.min_time_span)
        & ((t_max - t_min) >= config.min_time_span)
    )  # (b+1,)

    # Vmapped RANSAC over COMPACTED cluster roots: a root is a candidate
    # whose label equals its own index AND whose cluster passed the size/
    # span gates. At min_cluster_size edges per live cluster there can be
    # at most b // min_cluster_size of them — running RANSAC over all b
    # rows (most of them dead) wasted ~min_cluster_size× the work.
    n_roots = max(1, min(b, b // max(config.min_cluster_size, 1)))
    is_root = (labels == jnp.arange(b)) & valid & runs[jnp.arange(b)]
    root_slot = jnp.nonzero(is_root, size=n_roots, fill_value=-1)[0]
    root_live = root_slot >= 0
    root_safe = jnp.where(root_live, root_slot, 0)
    member = (
        (labels[None, :] == root_safe[:, None])
        & valid[None, :]
        & root_live[:, None]
    )  # (n_roots, b)
    keys = jax.random.split(key, n_roots)

    res = ransac.ransac_rigid_batch(
        keys,
        jnp.broadcast_to(p_pred, (n_roots, b, 3)),
        jnp.broadcast_to(p_act, (n_roots, b, 3)),
        member,
        config.ransac_hypotheses,
        config.max_error,
        config.min_cluster_size,
    )
    # consensus mask per root: recompute inliers under each root's model
    pred_t = jax.vmap(lambda p: lie.pose_apply(p, p_pred))(res.pose)  # (n_roots, b, 3)
    inlier = (
        (jnp.sum((pred_t - p_act[None]) ** 2, axis=-1) < config.max_error**2)
        & member
    )
    root_ok = res.ok & root_live

    # An edge is valid ONLY if its cluster ran and it is an inlier of its
    # root's model. Loop closures default to invalid in the reference
    # (``slam_edge.cpp:47``) and only the filter's whitelist reaches the
    # optimizer (``g2o_optimizer.cpp:97-103``) — small/short clusters
    # contribute nothing until they accumulate corroboration.
    # map each candidate's label to its compacted root row (-1 = none ran)
    rowmap = jnp.full((b + 1,), -1, jnp.int32)
    # dead rows scatter -1 into the spare slot b so they can clobber nothing
    rowmap = rowmap.at[jnp.where(root_live, root_safe, b)].set(
        jnp.where(root_live, jnp.arange(n_roots, dtype=jnp.int32), -1)
    )
    my_root = labels
    my_row = rowmap[jnp.clip(my_root, 0, b)]
    row_safe = jnp.maximum(my_row, 0)
    ran = (my_row >= 0) & root_ok[row_safe]
    is_inlier = inlier[row_safe, jnp.arange(b)]
    keep = ran & is_inlier

    # Cap per cluster: best ``max_edges_per_cluster`` by score + equally
    # spread by stamp (validEdges, :287-350). Only applied when a cluster
    # has > 2*max edges.
    score = jnp.where(keep & valid, g.e_score[ci], -jnp.inf)
    kmax = config.max_edges_per_cluster
    in_cluster_rank_score = _rank_within_cluster(score, my_root, b)
    order_stamp = jnp.where(keep & valid, sf, jnp.inf)
    in_cluster_rank_time = _rank_within_cluster(-order_stamp, my_root, b)
    n_kept = jax.ops.segment_sum((keep & valid).astype(jnp.int32), my_root, num_segments=b + 1)
    crowded = n_kept[my_root] > 2 * kmax
    spread_stride = jnp.maximum(n_kept[my_root] // kmax, 1)
    spread_pick = (in_cluster_rank_time % spread_stride) == 0
    cap_pick = (in_cluster_rank_score < kmax) | spread_pick
    keep = jnp.where(crowded, keep & cap_pick, keep)

    return keep & valid


def recent_candidates(mask: jax.Array, size: int) -> jax.Array:
    """Indices of the most recent ``size`` True entries of ``mask``
    (-1 padded). A plain ``nonzero(size=...)`` keeps the OLDEST slots and
    would permanently starve newly-added loop closures once the window
    fills; selecting from the tail keeps fresh candidates flowing while
    already-validated old edges retain their validity."""
    count = jnp.sum(mask)
    recent = mask & (jnp.cumsum(mask) > count - size)
    return jnp.nonzero(recent, size=size, fill_value=-1)[0].astype(jnp.int32)


def _rank_within_cluster(score: jax.Array, labels: jax.Array, b: int) -> jax.Array:
    """Rank (0 = best) of each element among its cluster by descending score."""
    higher = (
        (labels[None, :] == labels[:, None])
        & (score[None, :] > score[:, None])
    )
    return jnp.sum(higher, axis=-1)


def apply_filter(
    g: GraphState, key: jax.Array, config: FilterConfig = FilterConfig(),
    max_candidates: int = 256,
) -> GraphState:
    """Convenience wrapper: run the cluster filter over all non-odometry
    edges and write the validity verdict back into the graph (the role of
    ``calcValidEdges`` inside ``G2oOptimizer::addGraphImpl``)."""
    from uzliti_slam_tpu.graph import state as gstate

    is_lc = (
        (g.e_type != gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY)
        & g.e_valid
    )
    idx = recent_candidates(is_lc, max_candidates)
    keep = filter_loop_closures(g, idx, key, config)
    safe_idx = jnp.where(idx >= 0, idx, 0)
    new_valid = g.e_valid.at[safe_idx].set(
        jnp.where(idx >= 0, keep, g.e_valid[safe_idx])
    )
    return g._replace(e_valid=new_valid)
