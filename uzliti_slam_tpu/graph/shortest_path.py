"""On-device shortest-path relaxation over the pose graph.

Replaces the reference's host-side Dijkstra / A* with fibonacci heaps
(``slam_graph.cpp:765-890``) with masked Bellman-Ford iterations: each sweep
relaxes every valid edge in parallel (segment-min scatter), converging in
at most diameter sweeps.  Edge length = Euclidean distance between endpoint
poses via valid edges, exactly the reference's metric
(``slam_graph.cpp:788-790``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie

INF = jnp.float32(3.4e38)


def edge_lengths(g: GraphState) -> jax.Array:
    """Euclidean length of each edge from current node positions."""
    pf = lie.pose_t(g.pose[g.e_from])
    pt = lie.pose_t(g.pose[g.e_to])
    return jnp.linalg.norm(pf - pt, axis=-1)


def shortest_paths(
    g: GraphState,
    source_dist0: jax.Array,
    n_iters: int = 64,
    use_uncertainty_weight: bool = False,
) -> jax.Array:
    """Multi-source Bellman-Ford. ``source_dist0``: (N,) initial distances
    (0 at sources, +INF elsewhere). Returns (N,) geodesic distances.

    With ``use_uncertainty_weight`` the edge length becomes
    1/sqrt(info[0,0]) — the odometric-uncertainty metric the reference's
    commented variant used for uncertainty propagation.
    """
    if use_uncertainty_weight:
        w = 1.0 / jnp.sqrt(jnp.maximum(g.e_info[:, 0, 0], 1e-12))
    else:
        w = edge_lengths(g)
    w = jnp.where(g.e_valid, w, INF)
    ef, et = g.e_from, g.e_to
    n = g.node_capacity

    def body(_, dist):
        via_f = jnp.minimum(dist[ef] + w, INF)
        via_t = jnp.minimum(dist[et] + w, INF)
        dist = dist.at[et].min(via_f)
        dist = dist.at[ef].min(via_t)
        return dist

    return jax.lax.fori_loop(0, n_iters, body, source_dist0)


def pairwise_graph_distance(
    g: GraphState, sources: jax.Array, targets: jax.Array, n_iters: int = 64
) -> jax.Array:
    """Graph distance between B (source, target) node pairs; (B,).

    Batched replacement for per-pair A* (``slam_graph.cpp:844-890``): one
    (B, N) relaxation front, all pairs at once.
    """
    n = g.node_capacity
    b = sources.shape[0]
    init = jnp.full((b, n), INF).at[jnp.arange(b), sources].set(0.0)
    dist = jax.vmap(lambda d0: shortest_paths(g, d0, n_iters))(init)
    return dist[jnp.arange(b), targets]


def reevaluate_uncertainty(g: GraphState, n_iters: int = 64) -> GraphState:
    """Uncertainty = geodesic distance from the oldest valid node
    (reference ``reevaluateUncertainty``, ``slam_graph.cpp:506-517``:
    dijkstra from ``nodes_.begin()`` — the smallest/oldest key)."""
    stamp_key = jnp.where(g.node_valid, g.stamp, INF)
    root = jnp.argmin(stamp_key)
    d0 = jnp.full((g.node_capacity,), INF).at[root].set(0.0)
    dist = shortest_paths(g, d0, n_iters)
    unc = jnp.where(g.node_valid & (dist < INF), dist, g.uncertainty)
    return g._replace(uncertainty=unc)
