"""Offline TUM-format dataset evaluation (VERDICT r3 #1): generated PNG
dataset → io.tum loader → native prefetcher → full Slam loop → ATE vs
ground truth AND vs the g2o-equivalent sparse-GN oracle on the same final
graph (the measurable "g2o-equivalent ATE" claim). The full-scale
640x480/1040-frame run is the bench rung; this test pins the path at a
CI-friendly size."""

import numpy as np
import pytest

from uzliti_slam_tpu import eval as eval_mod
from uzliti_slam_tpu.io import simulator, tum


class TestTumRoundtrip:
    def test_png_roundtrip_8bit(self, tmp_path):
        img = (np.arange(64 * 48, dtype=np.uint32) % 251).astype(np.uint8).reshape(48, 64)
        p = str(tmp_path / "x.png")
        tum.write_png_gray(p, img)
        back = tum.read_png_gray(p)
        np.testing.assert_array_equal(back.astype(np.uint8), img)

    def test_png_roundtrip_16bit(self, tmp_path):
        dep = (np.arange(64 * 48, dtype=np.uint32) * 17 % 60001).astype(np.uint16).reshape(48, 64)
        p = str(tmp_path / "d.png")
        tum.write_png_gray(p, dep)
        back = tum.read_png_gray(p)
        np.testing.assert_array_equal(back.astype(np.uint16), dep)

    def test_export_is_idempotent(self, tmp_path):
        import os
        root = str(tmp_path / "seq")
        simulator.export_tum_dataset(root, n_frames=6, length=1.0, laps=1,
                                     img_h=48, img_w=64, f=52.0)
        mtime = os.path.getmtime(os.path.join(root, "rgb.txt"))
        simulator.export_tum_dataset(root, n_frames=6, length=1.0, laps=1,
                                     img_h=48, img_w=64, f=52.0)
        assert os.path.getmtime(os.path.join(root, "rgb.txt")) == mtime


@pytest.mark.slow
def test_tum_end_to_end_with_oracle_parity(tmp_path):
    root = str(tmp_path / "seq")
    simulator.export_tum_dataset(
        root, n_frames=64, length=4.0, laps=2,
        img_h=240, img_w=320, f=262.0, odom_drift=0.03,
    )
    out = eval_mod.run_tum_sequence(root, optimize_every=20, chunk=8)
    assert out["n_keyframes"] >= 30
    assert out["ate_slam_m"] < out["ate_odometry_m"]
    assert out["ate_slam_m"] < 0.1
    # g2o-equivalent parity: within 10% of the oracle's ATE on the same graph
    assert out["ate_parity"], (out["ate_slam_m"], out["ate_oracle_m"])
    assert out["chi2_ratio_vs_oracle"] < 1.10


@pytest.mark.slow
def test_hard_sequence_robustness(tmp_path):
    """Sensor-pathology robustness (depth holes/noise + exposure drift —
    the realism real freiburg playback would add; real datasets are
    unreachable from this environment): the pipeline must still beat raw
    odometry and stay near the oracle on a corrupted sequence."""
    from uzliti_slam_tpu import eval as eval_mod
    from uzliti_slam_tpu.config import SlamConfig
    from uzliti_slam_tpu.io import simulator

    root = str(tmp_path / "tum_hard")
    simulator.export_tum_dataset(
        root, n_frames=200, img_h=120, img_w=160, f=130.0,
        length=7.0, laps=2, odom_drift=0.08, hard=True,
    )
    out = eval_mod.run_tum_sequence(
        root, config=SlamConfig(node_capacity=256, edge_capacity=2048),
        optimize_every=25, chunk=8,
    )
    # corruption costs accuracy but must not break the loop: still well
    # below raw odometry and near the oracle solve on the same graph
    assert out["ate_slam_m"] < 0.5 * out["ate_odometry_m"]
    assert out["chi2_ratio_vs_oracle"] < 1.5
