"""SLAM must never lose to raw odometry (VERDICT r3 weak #1).

The failure mode: a mid-run solve lands the trajectory in a poor basin and
the final solve, started from it, stays stuck (LM rejects every step) at a
chi2/ATE worse than the odometry prior. The fix is the batched multi-start
(``SolverConfig.odometry_restart``): every pipeline solve also starts from
the diff-anchored odometry trajectory and keeps the lower-chi2 result —
the bar the reference meets by only ever refining the odometry prior
(``g2o_optimizer.cpp:137-149`` + filter whitelist).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


class TestOdometryRestart:
    def test_restart_rescues_bad_state(self):
        """From a corrupted pose state, the odometry start must win."""
        g, gt = synthetic.make_pose_graph(
            KEY, 60, odom_noise=0.03, rot_noise=0.01, loop_closure_every=6
        )
        # wreck the live poses; odom_pose still holds the odometry prior
        noise = 0.8 * jax.random.normal(jax.random.PRNGKey(3), (g.node_capacity, 6))
        g_bad = g._replace(pose=jax.vmap(lie.pose_retract)(g.pose, noise))

        cfg_off = solver.SolverConfig(iterations=10)
        cfg_on = solver.SolverConfig(iterations=10, odometry_restart=True)
        g_off, st_off = solver.optimize(g_bad, cfg_off)
        g_on, st_on = solver.optimize(g_bad, cfg_on)
        chi_off = float(st_off.chi2_history[-1])
        chi_on = float(st_on.chi2_history[-1])
        assert chi_on <= chi_off + 1e-3
        # the rescued solve must actually be good (near the clean solve)
        g_clean, st_clean = solver.optimize(g, cfg_off)
        assert chi_on < 2.0 * float(st_clean.chi2_history[-1]) + 1e-2

    def test_restart_never_hurts_clean_state(self):
        g, _ = synthetic.make_pose_graph(KEY, 50, loop_closure_every=10)
        g_off, st_off = solver.optimize(g, solver.SolverConfig(iterations=10))
        g_on, st_on = solver.optimize(
            g, solver.SolverConfig(iterations=10, odometry_restart=True)
        )
        assert float(st_on.chi2_history[-1]) <= float(st_off.chi2_history[-1]) + 1e-3

    def test_fixed_nodes_keep_pose_under_restart(self):
        g, _ = synthetic.make_pose_graph(KEY, 40, loop_closure_every=8)
        g = g._replace(node_fixed=g.node_fixed.at[0].set(True))
        p0 = np.asarray(g.pose[0])
        g2, _ = solver.optimize(
            g, solver.SolverConfig(iterations=10, odometry_restart=True)
        )
        np.testing.assert_allclose(np.asarray(g2.pose[0]), p0, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("frames", [16, 24, 36, 48])
def test_demo_beats_odometry(frames, monkeypatch):
    """The end-to-end demo PASS gate (ate < ate_odo) at every frame count —
    pins the r3 24-frame regression."""
    from uzliti_slam_tpu import demo

    monkeypatch.setattr(
        sys, "argv", ["demo", "--cpu", "--frames", str(frames)]
    )
    assert demo.main() == 0
