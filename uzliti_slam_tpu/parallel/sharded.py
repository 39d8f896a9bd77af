"""Sharded pose-graph solving over a TPU device mesh.

Replaces the reference's process-level distribution (ROS topics between
local/global SLAM nodes, ``slam.launch:1-22``) with mesh parallelism:

- **Edge sharding** (this module's ``optimize_sharded``): the factor table is
  partitioned across devices; each device computes partial gradients /
  Hessian-vector products over its edge shard, and node-indexed
  accumulations are psummed over ICI.  Poses stay replicated — a 100k-node
  graph is only ~2.8 MB of pose state, so replicating state while sharding
  the O(E) work is the right TPU trade (compute and HBM traffic scale 1/D,
  collectives ride ICI).
- **Instance batching** (``optimize_batch``): N independent SLAM instances
  (the reference's "N robots = N process trees") vmapped and sharded over a
  batch mesh axis — pure data parallelism via NamedSharding, no shard_map
  needed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.graph.solver import SolverConfig
from uzliti_slam_tpu.graph.state import GraphState


_EDGE_FIELDS = (
    "e_from", "e_to", "e_transform", "e_info", "e_type", "e_valid",
    "e_error", "e_age", "e_score",
)


def graph_partition_specs(axis_name: str) -> GraphState:
    """A GraphState of PartitionSpecs: edge tables sharded, the rest replicated."""
    specs = {}
    for field in GraphState._fields:
        if field in _EDGE_FIELDS:
            specs[field] = P(axis_name)
        else:
            specs[field] = P()
    return GraphState(**specs)


def pad_edges_to_multiple(g: GraphState, multiple: int) -> GraphState:
    """Pad the edge table with invalid slots so it splits evenly over devices."""
    e = g.edge_capacity
    target = ((e + multiple - 1) // multiple) * multiple
    if target == e:
        return g
    pad = target - e

    def pad_arr(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    return g._replace(
        **{f: pad_arr(getattr(g, f)) for f in _EDGE_FIELDS}
    )


def optimize_sharded(
    g: GraphState,
    mesh: Mesh,
    axis_name: str = "edge",
    config: SolverConfig = SolverConfig(),
) -> tuple[GraphState, jax.Array]:
    """LM solve with the edge table sharded over ``mesh[axis_name]``.

    Returns (updated graph, chi2 history). Jit-safe; collectives are psums
    over the named axis. The edge capacity must divide the axis size — use
    ``pad_edges_to_multiple`` first.
    """
    n_dev = mesh.shape[axis_name]
    if g.edge_capacity % n_dev != 0:
        raise ValueError(
            f"edge capacity {g.edge_capacity} not divisible by mesh axis "
            f"{axis_name}={n_dev}; call pad_edges_to_multiple first"
        )

    labels = solver.connected_components(g)
    gauge = solver.gauge_fix_mask(g, labels)
    free = (g.node_valid & ~gauge).astype(g.pose.dtype)

    in_specs = (graph_partition_specs(axis_name), P())
    out_specs = (P(), P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def run(g_shard: GraphState, free_rep: jax.Array):
        reduce = lambda x: jax.lax.psum(x, axis_name)
        poses, _, chi2_hist, _ = solver.lm_loop(g_shard, free_rep, config, reduce)
        return poses, chi2_hist

    poses, chi2_hist = run(g, free)

    r = solver.factors.batched_residuals(poses[g.e_from], poses[g.e_to], g.e_transform)
    e_err = solver.factors.edge_chi2(r, g.e_info) * g.e_valid
    g = g._replace(
        pose=poses,
        e_error=e_err,
        e_age=g.e_age + g.e_valid.astype(g.e_age.dtype),
    )
    return g, chi2_hist


def optimize_batch(
    graphs: GraphState,
    mesh: Mesh,
    axis_name: str | tuple = "batch",
    config: SolverConfig = SolverConfig(),
) -> GraphState:
    """Optimize a batch of independent SLAM instances (leading batch dim on
    every array), data-parallel over ``mesh[axis_name]`` (a tuple of axis
    names shards the batch over their product).

    This is the 4096-instance configuration from BASELINE.md: pure pjit —
    annotate shardings and let XLA partition the vmapped solve.
    """
    batch_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis_name)), graphs
    )
    graphs = jax.device_put(graphs, batch_sharding)
    # Fleet solver defaults (measured on TPU v5e, r5 sweep): 2 cyclic-
    # reduction levels (cutoff 16) with a Newton-Schulz dense-root inverse
    # (vmapped LU serializes per instance), and — for small per-instance
    # graphs — one-hot-matmul gathers/scatters (dense_gathers): a vmapped
    # fleet of tiny edge tables pays ~a tile access per index on TPU, and
    # the matmul form was a 2.6x fleet-throughput win.  Applied only when
    # the caller left the cutoff at its default — an explicit cutoff
    # (CPU/debug fleets) is honored.
    if config.chain_dense_cutoff == SolverConfig().chain_dense_cutoff:
        config = dataclasses.replace(
            config, chain_dense_cutoff=16, chain_root_ns=True,
            dense_gathers=graphs.pose.shape[-2] <= 128,
        )
    solve_one = lambda gr: solver.optimize(gr, config)[0]
    return jax.jit(jax.vmap(solve_one))(graphs)
