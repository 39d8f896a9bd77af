"""Occupancy-grid projection as a batched raycast + log-odds scatter.

Re-design of the reference's ``occupancy_grid_utils`` ray overlay
(``map_projection/src/graph_grid_mapper.cpp:295-401``): every (node,
bearing) ray is marched in parallel with a static step count; free cells
get a log-odds decrement, the hit cell an increment, accumulated with one
scatter-add — replacing the per-ray Bresenham loop.  Incremental projection
(only new nodes) with drift-triggered full rebuild mirrors ``:305-308``;
node positions are marked known-free as in ``:330-344``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


@dataclasses.dataclass(frozen=True)
class GridConfig:
    resolution: float = 0.05     # m/cell (slam.yaml:17-19)
    size: int = 256              # cells per side
    max_range: float = 6.0       # slam.yaml:42-43
    hit_logodds: float = 0.85
    miss_logodds: float = -0.4
    clamp: float = 10.0
    drift_dist: float = 0.5      # full-rebuild trigger (graph_grid_mapper.cpp:305-308)
    drift_angle_deg: float = 5.0


class OccupancyGrid(NamedTuple):
    logodds: jax.Array       # (size, size)
    origin: jax.Array        # (2,) world coords of cell (0, 0)
    last_projected: jax.Array  # () int32 — nodes [0, last) already projected
    ref_poses: jax.Array     # (N, 7) node poses at last projection (drift check)


def grid_init(g: GraphState, config: GridConfig = GridConfig()) -> OccupancyGrid:
    half = config.size * config.resolution / 2
    return OccupancyGrid(
        logodds=jnp.zeros((config.size, config.size)),
        origin=jnp.array([-half, -half]),
        last_projected=jnp.zeros((), dtype=jnp.int32),
        ref_poses=lie.pose_identity((g.node_capacity,)),
    )


def auto_origin(g: GraphState, config: GridConfig) -> jax.Array:
    """Center the grid on the graph bounding box (``:535-573``)."""
    t = lie.pose_t(g.pose)
    big = 1e9
    mn = jnp.min(jnp.where(g.node_valid[:, None], t[:, :2], big), axis=0)
    mx = jnp.max(jnp.where(g.node_valid[:, None], t[:, :2], -big), axis=0)
    center = 0.5 * (mn + mx)
    half = config.size * config.resolution / 2
    return center - half


def _project_rays(
    logodds: jax.Array,
    poses: jax.Array,       # (M, 7) node poses
    scans: jax.Array,       # (M, B) ranges
    mask: jax.Array,        # (M,) project this node?
    origin: jax.Array,
    config: GridConfig,
) -> jax.Array:
    m, b = scans.shape
    size = config.size
    res = config.resolution
    n_steps = int(config.max_range / res)

    ang = -jnp.pi + (2 * jnp.pi) * (jnp.arange(b) + 0.5) / b
    yaw = lie.yaw_of(lie.pose_q(poses))                      # (M,)
    world_ang = yaw[:, None] + ang[None, :]                  # (M, B)
    px = lie.pose_t(poses)[:, 0:1]
    py = lie.pose_t(poses)[:, 1:2]

    # A finite return inside max_range marks its endpoint occupied; a
    # finite return BEYOND max_range still carves free space up to
    # max_range (the reference ray overlay does the same). Only rays with
    # no return at all (inf) carry no evidence.
    has_return = jnp.isfinite(scans)
    hit = has_return & (scans <= config.max_range)
    reach = jnp.where(has_return, jnp.minimum(scans, config.max_range), 0.0)

    t = (jnp.arange(n_steps) + 0.5) * res                    # (S,)
    # sample points along every ray: (M, B, S)
    sx = px[:, :, None] + jnp.cos(world_ang)[..., None] * t[None, None, :]
    sy = py[:, :, None] + jnp.sin(world_ang)[..., None] * t[None, None, :]
    free = (
        has_return[..., None]
        & (t[None, None, :] < reach[..., None] - res)
        & mask[:, None, None]
    )
    # half-open endpoint window: a range on an exact cell boundary must
    # mark ONE cell, not two
    dt_end = t[None, None, :] - scans[..., None]
    occ = (
        hit[..., None]
        & (dt_end >= -0.5 * res)
        & (dt_end < 0.5 * res)
        & mask[:, None, None]
    )

    cx = jnp.floor((sx - origin[0]) / res).astype(jnp.int32)
    cy = jnp.floor((sy - origin[1]) / res).astype(jnp.int32)
    inside = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    cell = jnp.where(inside, cy * size + cx, size * size)    # OOB -> dropped

    delta = (
        free.astype(jnp.float32) * config.miss_logodds
        + occ.astype(jnp.float32) * config.hit_logodds
    )
    flat = jnp.zeros((size * size + 1,))
    flat = flat.at[cell.reshape(-1)].add(delta.reshape(-1))
    out = logodds + flat[:-1].reshape(size, size)
    return jnp.clip(out, -config.clamp, config.clamp)


def _mark_node_cells(logodds, poses, mask, origin, config: GridConfig):
    """Robot footprint cells are known-free (``:330-344``)."""
    res = config.resolution
    size = config.size
    t = lie.pose_t(poses)
    cx = jnp.floor((t[:, 0] - origin[0]) / res).astype(jnp.int32)
    cy = jnp.floor((t[:, 1] - origin[1]) / res).astype(jnp.int32)
    inside = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size) & mask
    cell = jnp.where(inside, cy * size + cx, size * size)
    flat = jnp.zeros((size * size + 1,))
    flat = flat.at[cell].add(2.0 * config.miss_logodds)
    return jnp.clip(logodds + flat[:-1].reshape(size, size), -config.clamp, config.clamp)


def project(
    grid: OccupancyGrid,
    g: GraphState,
    scans: jax.Array,
    scan_valid: jax.Array,
    config: GridConfig = GridConfig(),
    force_full: bool = False,
    recenter: bool = True,
) -> OccupancyGrid:
    """Project the graph's scans into the grid.

    Incremental: only nodes at slots ≥ ``last_projected`` are rendered,
    unless any already-projected node drifted more than the threshold since
    the last projection — then the whole map is rebuilt from scratch
    (``occupancy_grid_projector.cpp:52-76``). A full rebuild also recenters
    the grid on the graph bounding box (the reference's map auto-sizing,
    ``graph_grid_mapper.cpp:535-573``) unless ``recenter=False``."""
    n = g.node_capacity
    slots = jnp.arange(n)

    dt, dr = lie.pose_distance(g.pose, grid.ref_poses)
    already = (slots < grid.last_projected) & g.node_valid
    drifted = jnp.any(
        already
        & ((dt > config.drift_dist) | (jnp.degrees(dr) > config.drift_angle_deg))
    )
    # incremental path rays only a static window of recent slots (a full
    # (N, B, S) raycast per call would make 'incremental' cost the same
    # compute/memory as a rebuild); too many new nodes forces a rebuild
    window = min(64, n)
    full = (
        drifted
        | jnp.asarray(force_full)
        | (g.num_nodes - grid.last_projected > window)
    )

    def project_full(_):
        mask = g.node_valid & scan_valid
        org = auto_origin(g, config) if recenter else grid.origin
        lo = _project_rays(
            jnp.zeros_like(grid.logodds), g.pose, scans, mask, org, config
        )
        return _mark_node_cells(lo, g.pose, mask, org, config), org

    def project_incremental(_):
        start = jnp.clip(g.num_nodes - window, 0, n - window)
        p_w = jax.lax.dynamic_slice(g.pose, (start, 0), (window, 7))
        s_w = jax.lax.dynamic_slice(scans, (start, 0), (window, scans.shape[1]))
        m_w = (
            jax.lax.dynamic_slice_in_dim(g.node_valid & scan_valid, start, window)
            & (start + jnp.arange(window) >= grid.last_projected)
        )
        lo = _project_rays(grid.logodds, p_w, s_w, m_w, grid.origin, config)
        return _mark_node_cells(lo, p_w, m_w, grid.origin, config), grid.origin

    lo, origin = jax.lax.cond(full, project_full, project_incremental, None)

    return OccupancyGrid(
        logodds=lo,
        origin=origin,
        last_projected=jnp.maximum(grid.last_projected, g.num_nodes),
        # snapshot poses of everything projected so far for the drift check
        ref_poses=jnp.where(
            ((slots < jnp.maximum(grid.last_projected, g.num_nodes))
             & g.node_valid)[:, None] | full,
            g.pose, grid.ref_poses,
        ),
    )


def occupancy_probability(grid: OccupancyGrid) -> jax.Array:
    """Log-odds -> probability map in [0, 1]; 0.5 = unknown."""
    return jax.nn.sigmoid(grid.logodds)


def to_ternary(grid: OccupancyGrid, occ_thresh: float = 0.65, free_thresh: float = 0.35):
    """ROS-style -1/0/100 occupancy classes."""
    p = occupancy_probability(grid)
    unknown = jnp.abs(grid.logodds) < 1e-6
    return jnp.where(unknown, -1, jnp.where(p > occ_thresh, 100, jnp.where(p < free_thresh, 0, -1)))
