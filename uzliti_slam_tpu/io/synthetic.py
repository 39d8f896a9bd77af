"""Synthetic trajectory / pose-graph generation for tests and benchmarks.

Plays the role of the reference's dataset playback verification
(``iti_slam_launch/launch/dataset.launch:1-36`` replaying the ITI rosbag):
ground-truth trajectories with noisy odometry and loop closures, at
configurable scale (100-node … 100k-node, per BASELINE.md configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.graph.state import GraphState
from uzliti_slam_tpu.ops import lie


def circle_trajectory(n: int, radius: float = 10.0, loops: float = 2.0) -> jax.Array:
    """Ground-truth poses along a circle, heading tangent. (n, 7)."""
    th = jnp.linspace(0.0, loops * 2 * jnp.pi, n)
    x = radius * jnp.cos(th)
    y = radius * jnp.sin(th)
    yaw = th + jnp.pi / 2
    return lie.pose2_to_pose(jnp.stack([x, y, yaw], axis=-1))


# Default capacity policy for generated graphs. "exact" sizes the padded
# tables to the request; "pow2" rounds capacities up to the next power of
# two (min 32).  The test suite switches to "pow2" so the dozens of small
# synthetic graphs collapse onto a handful of array shapes — every XLA
# program and every jax trace is keyed on shapes, so shape dedupe is what
# makes the suite's compile/trace cost O(distinct tiers) instead of
# O(distinct test sizes).  Benchmarks keep "exact" shapes.
capacity_rounding = "exact"


def _round_capacity(n: int) -> int:
    if capacity_rounding != "pow2":
        return n
    return max(32, 1 << (n - 1).bit_length())


def make_pose_graph(
    key: jax.Array,
    n_nodes: int,
    odom_noise: float = 0.02,
    rot_noise: float = 0.005,
    loop_closure_every: int = 0,
    loop_noise: float = 0.01,
    node_capacity: int | None = None,
    edge_capacity: int | None = None,
    radius: float = 10.0,
    loops: float = 2.0,
) -> tuple[GraphState, jax.Array]:
    """Build a padded GraphState from a noisy circle sequence.

    Returns (graph, ground_truth_poses). Initial node poses are the noisy
    odometry integration (what a real SLAM front-end would start from);
    odometry edges get the motion-dependent information model; optional
    loop-closure edges connect revisit pairs half a revolution apart.
    """
    gt = circle_trajectory(n_nodes, radius=radius, loops=loops)
    rel_gt = lie.pose_relative(gt[:-1], gt[1:])

    k1, k2 = jax.random.split(key)
    noise = jnp.concatenate(
        [
            odom_noise * jax.random.normal(k1, (n_nodes - 1, 3)),
            rot_noise * jax.random.normal(k2, (n_nodes - 1, 3)),
        ],
        axis=-1,
    )
    odom_meas = lie.pose_compose(rel_gt, lie.se3_exp(noise))

    # Integrate noisy odometry for initial poses.
    def step(carry, m):
        nxt = lie.pose_compose(carry, m)
        return nxt, nxt

    _, integrated = jax.lax.scan(step, gt[0], odom_meas)
    init_poses = jnp.concatenate([gt[0:1], integrated], axis=0)

    ncap = node_capacity or _round_capacity(n_nodes)
    # loop closures between i and i + n/loops revisit offset
    lc_pairs = []
    if loop_closure_every:
        period = int(n_nodes / max(loops, 1.0))
        for i in range(0, n_nodes - period, loop_closure_every):
            lc_pairs.append((i, i + period))
    ecap = edge_capacity or _round_capacity(n_nodes - 1 + len(lc_pairs))

    g = gstate.empty_graph(ncap, ecap)
    idx = jnp.arange(n_nodes, dtype=jnp.int32)
    g = g._replace(
        pose=g.pose.at[:n_nodes].set(init_poses),
        odom_pose=g.odom_pose.at[:n_nodes].set(init_poses),
        stamp=g.stamp.at[:n_nodes].set(0.1 * idx.astype(jnp.float32)),
        node_valid=g.node_valid.at[:n_nodes].set(True),
        node_uid=g.node_uid.at[:n_nodes].set(idx),
        num_nodes=jnp.asarray(n_nodes, dtype=jnp.int32),
    )

    n_odom = n_nodes - 1
    info_odom = gstate.odometry_information(odom_meas)
    e_from = list(range(n_odom))
    e_to = list(range(1, n_nodes))
    e_T = [odom_meas]
    e_info = [info_odom]
    e_type = [gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY] * n_odom

    if lc_pairs:
        lf = jnp.array([p[0] for p in lc_pairs], dtype=jnp.int32)
        lt = jnp.array([p[1] for p in lc_pairs], dtype=jnp.int32)
        k3, k4 = jax.random.split(k2)
        lnoise = jnp.concatenate(
            [
                loop_noise * jax.random.normal(k3, (len(lc_pairs), 3)),
                loop_noise * jax.random.normal(k4, (len(lc_pairs), 3)),
            ],
            axis=-1,
        )
        lc_meas = lie.pose_compose(lie.pose_relative(gt[lf], gt[lt]), lie.se3_exp(lnoise))
        # lc_pairs is static python — no device round trip, and the whole
        # builder stays traceable (vmap over keys => batches of DISTINCT
        # instances for the fleet benches)
        e_from += [p[0] for p in lc_pairs]
        e_to += [p[1] for p in lc_pairs]
        e_T.append(lc_meas)
        e_info.append(jnp.broadcast_to(100.0 * jnp.eye(6), (len(lc_pairs), 6, 6)))
        e_type += [gstate.EDGE_TYPE_3D_FULL] * len(lc_pairs)

    n_e = len(e_from)
    g = g._replace(
        e_from=g.e_from.at[:n_e].set(jnp.array(e_from, dtype=jnp.int32)),
        e_to=g.e_to.at[:n_e].set(jnp.array(e_to, dtype=jnp.int32)),
        e_transform=g.e_transform.at[:n_e].set(jnp.concatenate(e_T, axis=0)),
        e_info=g.e_info.at[:n_e].set(jnp.concatenate(e_info, axis=0)),
        e_type=g.e_type.at[:n_e].set(jnp.array(e_type, dtype=jnp.int32)),
        e_valid=g.e_valid.at[:n_e].set(True),
        num_edges=jnp.asarray(n_e, dtype=jnp.int32),
    )
    return g, gt


def ate_rmse(est: jax.Array, gt: jax.Array, align: bool = True) -> jax.Array:
    """Absolute trajectory error (RMSE over translations), optional SE(3)
    Umeyama alignment — the TUM-tooling metric the reference exports
    trajectories for (``fastfusion_projector.cpp:60-73``)."""
    pe = lie.pose_t(est)
    pg = lie.pose_t(gt)
    if align:
        mu_e = pe.mean(axis=0)
        mu_g = pg.mean(axis=0)
        ce = pe - mu_e
        cg = pg - mu_g
        cov = cg.T @ ce / pe.shape[0]
        u, s, vt = jnp.linalg.svd(cov)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        D = jnp.diag(jnp.array([1.0, 1.0, d]))
        R = u @ D @ vt
        pe = (R @ ce.T).T + mu_g
        pg = cg + mu_g
    return jnp.sqrt(jnp.mean(jnp.sum((pe - pg) ** 2, axis=-1)))
