"""Calibration solver tests (SURVEY.md §7 phase 11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.graph import calibration
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def build_calib_problem(true_L_twist, n=40):
    """Graph with ground-truth poses; sensor edges measured through a
    miscalibrated extrinsic L; odometry edges exact."""
    # Planar motion leaves parts of the extrinsic unobservable (hand-eye
    # degeneracy); add out-of-plane wobble for full 6-DoF observability.
    base = synthetic.circle_trajectory(n, radius=4.0)
    ph = jnp.linspace(0.0, 6 * jnp.pi, n)
    wobble = jnp.stack(
        [jnp.zeros(n), jnp.zeros(n), 0.3 * jnp.sin(ph),
         0.2 * jnp.sin(1.3 * ph), 0.2 * jnp.cos(0.7 * ph), jnp.zeros(n)],
        axis=-1,
    )
    gt = lie.pose_compose(base, lie.se3_exp(wobble))
    g = gstate.empty_graph(n, 4 * n)
    idx = jnp.arange(n, dtype=jnp.int32)
    g = g._replace(
        pose=g.pose.at[:n].set(gt),
        odom_pose=g.odom_pose.at[:n].set(gt),
        stamp=g.stamp.at[:n].set(0.1 * idx.astype(jnp.float32)),
        node_valid=g.node_valid.at[:n].set(True),
        node_uid=g.node_uid.at[:n].set(idx),
        num_nodes=jnp.asarray(n, jnp.int32),
    )
    true_L = lie.se3_exp(jnp.asarray(true_L_twist))
    info = jnp.eye(6) * 100.0
    esf, est_ = [], []
    for i in range(n - 1):
        # odometry edge
        g, _ = gstate.add_edge(
            g, jnp.asarray(i, jnp.int32), jnp.asarray(i + 1, jnp.int32),
            lie.pose_relative(gt[i], gt[i + 1]), info,
            etype=gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY,
        )
        esf.append(-1); est_.append(-1)
        # sensor edge i -> i+2 measured in sensor frame
        if i + 2 < n:
            meas = lie.pose_relative(
                lie.pose_compose(gt[i], true_L), lie.pose_compose(gt[i + 2], true_L)
            )
            g, _ = gstate.add_edge(
                g, jnp.asarray(i, jnp.int32), jnp.asarray(i + 2, jnp.int32),
                meas, info, etype=gstate.EDGE_TYPE_3D_FULL,
            )
            esf.append(0); est_.append(0)
    pad = g.edge_capacity - len(esf)
    e_sf = jnp.asarray(esf + [-1] * pad, jnp.int32)
    e_st = jnp.asarray(est_ + [-1] * pad, jnp.int32)
    return g, true_L, e_sf, e_st


class TestSensorCalibration:
    def test_recovers_extrinsic(self):
        true_twist = jnp.array([0.08, -0.05, 0.1, 0.04, -0.06, 0.09])
        g, true_L, e_sf, e_st = build_calib_problem(true_twist)
        init = lie.pose_identity((1,))
        res = calibration.calibrate(g, init, e_sf, e_st, iterations=15, prior_weight=1e-4)
        dt, dr = lie.pose_distance(res.sensor_transforms[0], true_L)
        assert float(res.final_cost) < float(res.cost_history[0]) * 1e-3
        assert float(dt) < 0.01 and float(dr) < 0.01

    def test_prior_holds_when_no_information(self):
        # no sensor edges at all: extrinsic stays at its initial value
        g, _, e_sf, e_st = build_calib_problem(jnp.zeros(6))
        e_sf = jnp.full_like(e_sf, -1)
        init = lie.se3_exp(jnp.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.0]))[None]
        res = calibration.calibrate(g, init, e_sf, e_st, iterations=10)
        dt, dr = lie.pose_distance(res.sensor_transforms[0], init[0])
        assert float(dt) < 1e-4 and float(dr) < 1e-4


class TestOdometryCalibration:
    def test_drift_correct_model(self):
        meas = lie.pose2_to_pose(jnp.array([1.0, 0.0, 0.5]))
        p = jnp.array([2.0, 0.1, 0.05])
        out = calibration.odometry_drift_correct(meas, p)
        drift = 0.1 * 0.5 + 0.05 * 1.0
        np.testing.assert_allclose(
            float(lie.yaw_of(lie.pose_q(out))), 0.5 + drift, atol=1e-5
        )
        np.testing.assert_allclose(
            float(jnp.linalg.norm(lie.pose_t(out))), 2.0, atol=1e-5
        )

    @pytest.mark.slow
    def test_recovers_odom_params(self):
        """Odometry measurements corrupted with a known drift model; the
        solver must recover the inverse warp."""
        # Constant-speed circles confound p1 and p2 (|yaw| ∝ ‖t‖ on every
        # edge). Mix straight segments (observe p2) with turns (observe p1).
        segs = []
        x, y, th = 0.0, 0.0, 0.0
        for rep in range(6):
            for _ in range(6):  # straight
                x += 0.5 * np.cos(th)
                y += 0.5 * np.sin(th)
                segs.append((x, y, th))
            for _ in range(4):  # turn in place
                th += 0.4
                segs.append((x, y, th))
        gt = lie.pose2_to_pose(jnp.asarray(segs, jnp.float32))
        n = gt.shape[0]
        true_p = jnp.array([1.05, 0.03, 0.01])
        g = gstate.empty_graph(n, 2 * n)
        idx = jnp.arange(n, dtype=jnp.int32)
        g = g._replace(
            pose=g.pose.at[:n].set(gt),
            odom_pose=g.odom_pose.at[:n].set(gt),
            stamp=g.stamp.at[:n].set(0.1 * idx.astype(jnp.float32)),
            node_valid=g.node_valid.at[:n].set(True),
            node_uid=g.node_uid.at[:n].set(idx),
            num_nodes=jnp.asarray(n, jnp.int32),
        )
        info = jnp.eye(6) * 100.0
        # warp(meas, p) should equal the true relative pose when p = true_p;
        # i.e. raw odometry reads warp^-1 — build meas so that
        # drift_correct(meas, true_p) == rel
        for i in range(n - 1):
            rel = lie.pose_relative(gt[i], gt[i + 1])
            # invert the warp numerically: since drift depends on meas, use
            # fixed-point iteration (converges fast for small drift)
            meas = rel
            for _ in range(8):
                corr = calibration.odometry_drift_correct(meas, true_p)
                err = lie.pose_compose(lie.pose_inverse(corr), rel)
                meas = lie.pose_compose(meas, err)
            g, _ = gstate.add_edge(
                g, jnp.asarray(i, jnp.int32), jnp.asarray(i + 1, jnp.int32),
                meas, info, etype=gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY,
            )
        e_s = jnp.full((g.edge_capacity,), -1, jnp.int32)
        res = calibration.calibrate(
            g, lie.pose_identity((1,)), e_s, e_s, iterations=25
        )
        np.testing.assert_allclose(np.asarray(res.odom_params), np.asarray(true_p), atol=5e-3)


def _warp_inverse(rel, p, iters=8):
    """meas such that drift_correct(meas, p) == rel (fixed-point)."""
    meas = rel
    for _ in range(iters):
        corr = calibration.odometry_drift_correct(meas, p)
        err = lie.pose_compose(lie.pose_inverse(corr), rel)
        meas = lie.pose_compose(meas, err)
    return meas


def build_biased_odometry_slam(p_true, n=50, closure_every=5):
    """A SLAM problem whose odometry edges carry a known drift bias.

    True trajectory mixes straights and turns (so p1/p2 are separately
    observable); recorded odometry measurements are the inverse warp of
    the true relative motion; sparse exact loop closures anchor the truth.
    Node poses initialize at integrated RAW odometry (the drifted guess).
    """
    segs = []
    x, y, th = 0.0, 0.0, 0.0
    while len(segs) < n:
        for _ in range(5):
            x += 0.4 * np.cos(th)
            y += 0.4 * np.sin(th)
            segs.append((x, y, th))
        for _ in range(3):
            th += 0.35
            segs.append((x, y, th))
    gt = lie.pose2_to_pose(jnp.asarray(segs[:n], jnp.float32))
    meas = jax.vmap(lambda a, b: _warp_inverse(lie.pose_relative(a, b), p_true))(
        gt[:-1], gt[1:]
    )
    # integrate raw odometry for the initial guess
    odo = [gt[0]]
    for i in range(n - 1):
        odo.append(lie.pose_compose(odo[-1], meas[i]))
    odo = jnp.stack(odo)

    g = gstate.empty_graph(n, 4 * n)
    idx = jnp.arange(n, dtype=jnp.int32)
    g = g._replace(
        pose=g.pose.at[:n].set(odo),
        odom_pose=g.odom_pose.at[:n].set(odo),
        stamp=g.stamp.at[:n].set(0.1 * idx.astype(jnp.float32)),
        node_valid=g.node_valid.at[:n].set(True),
        node_uid=g.node_uid.at[:n].set(idx),
        num_nodes=jnp.asarray(n, jnp.int32),
    )
    info_odo = jnp.eye(6) * 10.0
    info_lc = jnp.eye(6) * 1000.0
    for i in range(n - 1):
        g, _ = gstate.add_edge(
            g, jnp.asarray(i, jnp.int32), jnp.asarray(i + 1, jnp.int32),
            meas[i], info_odo, etype=gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY,
        )
    for i in range(0, n - closure_every, closure_every):
        j = i + closure_every
        g, _ = gstate.add_edge(
            g, jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32),
            lie.pose_relative(gt[i], gt[j]), info_lc,
            etype=gstate.EDGE_TYPE_3D_FULL,
        )
    return g, gt


class TestLiveCalibrationWiring:
    """VERDICT r4 #3: calibration wired into the live system — the solver
    consumes graph.odom_params (g2o_optimizer.cpp:209-227), Slam.calibrate
    refreshes them, and the scope protocol ships them
    (graph_slam_node.cpp:523-529)."""

    def test_solver_consumes_odom_params(self):
        from uzliti_slam_tpu.graph import solver as gsolver
        from uzliti_slam_tpu.io import synthetic

        p_true = jnp.array([1.04, 0.05, 0.03])
        g, gt = build_biased_odometry_slam(p_true)
        cfg_off = gsolver.SolverConfig(iterations=15)
        cfg_on = gsolver.SolverConfig(
            iterations=15, use_odometry_calibration=True
        )
        g_off, stats_off = gsolver.optimize(g, cfg_off)
        g_on, stats_on = gsolver.optimize(
            g._replace(odom_params=p_true), cfg_on
        )
        chi_off = float(stats_off.chi2_history[-1])
        chi_on = float(stats_on.chi2_history[-1])
        assert chi_on < 0.2 * chi_off, (chi_on, chi_off)
        ate_off = float(synthetic.ate_rmse(g_off.pose[: gt.shape[0]], gt))
        ate_on = float(synthetic.ate_rmse(g_on.pose[: gt.shape[0]], gt))
        assert ate_on < ate_off
        # measurements stay RAW on write-back
        np.testing.assert_allclose(
            np.asarray(g_on.e_transform), np.asarray(g.e_transform), atol=1e-6
        )

    def test_slam_calibrate_epoch_recovers_params(self):
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import SlamConfig

        p_true = jnp.array([1.04, 0.05, 0.03])
        g, gt = build_biased_odometry_slam(p_true)
        # a well-optimized graph (poses at truth) — the live cadence runs
        # calibrate after optimize epochs
        g = g._replace(pose=g.pose.at[: gt.shape[0]].set(gt))
        cfg = SlamConfig(node_capacity=64, edge_capacity=256,
                         feats_per_node=16, scan_bins=16)
        slam = pipeline.Slam(cfg)
        slam.state = slam.state._replace(graph=g)
        res = slam.calibrate()
        np.testing.assert_allclose(
            np.asarray(slam.state.graph.odom_params), np.asarray(p_true),
            atol=2e-2,
        )
        assert float(res.final_cost) < float(res.cost_history[0])

    def test_scope_delta_ships_odom_params(self):
        from uzliti_slam_tpu.parallel import scope

        p = jnp.array([1.02, 0.01, -0.02])
        g, _ = build_biased_odometry_slam(p, n=12, closure_every=4)
        g = g._replace(odom_params=p)
        ship = scope.ship_state_init(g)
        gists = jnp.zeros((g.node_capacity, 32), jnp.uint8)
        sensor_t = lie.pose_identity((1,))
        delta = scope.make_delta(
            g, ship, gists, max_nodes=16, max_edges=32,
            sensor_transforms=sensor_t,
        )
        np.testing.assert_allclose(np.asarray(delta.odom_params), np.asarray(p))
        assert delta.sensor_transforms is not None
        g2 = gstate.empty_graph(32, 64)
        g2, ack = scope.apply_delta(g2, delta)
        np.testing.assert_allclose(
            np.asarray(g2.odom_params), np.asarray(p)
        )
