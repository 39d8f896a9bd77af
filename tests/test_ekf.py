"""Odometry-fusion EKF tests (robot_pose_ekf counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.frontend import ekf
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def simulate(n=200, dt=0.1, v=0.5, w=0.3, odom_noise=0.01, gyro_noise=0.002, seed=0):
    """Ground-truth unicycle + noisy odom deltas + noisy gyro."""
    rng = np.random.default_rng(seed)
    yaw = np.cumsum(np.full(n, w * dt))
    x = np.cumsum(v * dt * np.cos(yaw))
    y = np.cumsum(v * dt * np.sin(yaw))
    odom = np.stack([
        np.full(n, v * dt) + rng.normal(0, odom_noise, n),
        np.zeros(n),
        np.full(n, w * dt) + rng.normal(0, odom_noise, n),
    ], axis=-1)
    gyro = np.full(n, w) + rng.normal(0, gyro_noise, n)
    gt = np.stack([x, y, yaw], axis=-1)
    return jnp.full((n,), dt), jnp.asarray(odom, jnp.float32), jnp.asarray(gyro, jnp.float32), gt


class TestEkf:
    def test_tracks_circle(self):
        dts, odom, gyro, gt = simulate()
        poses = ekf.fuse_sequence(dts, odom, gyro)
        est = np.asarray(lie.pose_to_pose2(poses))
        err = np.linalg.norm(est[-1, :2] - gt[-1, :2])
        assert err < 0.5  # bounded drift over 20 s
        dyaw = np.arctan2(np.sin(est[-1, 2] - gt[-1, 2]), np.cos(est[-1, 2] - gt[-1, 2]))
        assert abs(dyaw) < 0.1

    def test_gyro_corrects_bad_odometry_rotation(self):
        """Wheel odometry with a strong rotational bias; gyro must dominate
        yaw — the reason the reference fuses IMU at all."""
        dts, odom, gyro, gt = simulate(odom_noise=0.0)
        odom_bad = odom.at[:, 2].add(0.05)  # +0.05 rad/step bias (huge)
        fused = ekf.fuse_sequence(dts, odom_bad, gyro)
        est = np.asarray(lie.pose_to_pose2(fused))
        # odometry-only yaw would be off by 200*0.05 = 10 rad; fused stays close
        dyaw = np.arctan2(np.sin(est[-1, 2] - gt[-1, 2]), np.cos(est[-1, 2] - gt[-1, 2]))
        assert abs(dyaw) < 0.5

    def test_covariance_stays_bounded_and_spd(self):
        dts, odom, gyro, _ = simulate(n=50)
        s = ekf.ekf_init()
        for i in range(50):
            s = ekf.ekf_predict(s, dts[i])
            s = ekf.ekf_update_odom(s, odom[i], dts[i])
            s = ekf.ekf_update_imu_yaw_rate(s, gyro[i])
        P = np.asarray(s.P)
        assert np.all(np.linalg.eigvalsh((P + P.T) / 2) > -1e-8)
        assert np.all(np.isfinite(P))

    def test_absolute_yaw_update(self):
        s = ekf.ekf_init()
        s = ekf.ekf_update_imu_yaw(s, jnp.asarray(0.5), sigma=0.001)
        assert abs(float(s.x[2]) - 0.5) < 0.05

    def test_pose_output_format(self):
        s = ekf.ekf_init(jnp.array([1.0, 2.0, 0.3, 0.0, 0.0]))
        p = ekf.ekf_pose(s)
        np.testing.assert_allclose(np.asarray(lie.pose_t(p)), [1.0, 2.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(float(lie.yaw_of(lie.pose_q(p))), 0.3, atol=1e-6)


class TestPipelineFusion:
    """Odometry fusion is part of the pipeline shell (not serve-only):
    every ingestion surface — serve, demo, runner, offline eval — can call
    ``Slam.fuse_odometry`` upstream of the keyframe gate (the reference
    runs robot_pose_ekf in front of the SLAM node, pose_ekf.launch:4-17)."""

    def test_slam_fuse_odometry_tracks_forward_drive(self):
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import SlamConfig

        slam = pipeline.Slam(SlamConfig(
            node_capacity=16, edge_capacity=64, feats_per_node=32, scan_bins=90,
        ))
        pose = lambda x: np.asarray(lie.make_pose(
            jnp.array([x, 0.0, 0.0], jnp.float32),
            jnp.array([1.0, 0, 0, 0], jnp.float32),
        ))
        fused = [
            slam.fuse_odometry(pose(0.2 * i), float(i) * 0.5,
                               np.zeros(3, np.float32))
            for i in range(6)
        ]
        xs = np.array([f[0] for f in fused])
        assert abs(xs[-1] - 1.0) < 0.25
        assert np.all(np.diff(xs[1:]) > 0)
        # the gyro drives yaw through the rate state: nonzero rates turn
        # the fused heading once the next predict integrates them
        slam.fuse_odometry(pose(1.2), 3.0, np.full(4, 0.8, np.float32))
        turned = slam.fuse_odometry(pose(1.4), 3.5, np.full(4, 0.8, np.float32))
        assert abs(float(lie.yaw_of(lie.pose_q(jnp.asarray(turned))))) > 0.05
