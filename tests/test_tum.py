"""TUM format loader tests: write a synthetic TUM directory, load it back."""

import os
import struct
import tempfile
import zlib

import numpy as np

from uzliti_slam_tpu.io import tum


def write_png_gray(path, arr, bit_depth=16):
    """Minimal PNG writer (filter 0 rows) for test fixtures."""
    h, w = arr.shape
    if bit_depth == 16:
        a = arr.astype(">u2")
        raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
        color_type = 0
    else:
        a = arr.astype(np.uint8)
        raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
        color_type = 0

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return c + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def make_tum_dir(d, n=5):
    os.makedirs(os.path.join(d, "rgb"))
    os.makedirs(os.path.join(d, "depth"))
    rng = np.random.default_rng(0)
    with open(os.path.join(d, "rgb.txt"), "w") as fr, \
         open(os.path.join(d, "depth.txt"), "w") as fd, \
         open(os.path.join(d, "groundtruth.txt"), "w") as fg:
        fr.write("# rgb\n")
        fd.write("# depth\n")
        fg.write("# gt\n")
        for i in range(n):
            stamp = 100.0 + 0.1 * i
            img = rng.integers(0, 255, (32, 40)).astype(np.uint8)
            dep_m = 1.0 + 0.1 * i
            dep = np.full((32, 40), dep_m * tum.DEPTH_SCALE).astype(np.uint16)
            write_png_gray(os.path.join(d, f"rgb/{i}.png"), img, 8)
            write_png_gray(os.path.join(d, f"depth/{i}.png"), dep, 16)
            fr.write(f"{stamp:.4f} rgb/{i}.png\n")
            fd.write(f"{stamp + 0.004:.4f} depth/{i}.png\n")
            fg.write(f"{stamp:.4f} {0.1*i:.4f} 0 0 0 0 0 1\n")
    return d


class TestTum:
    def test_load_sequence(self):
        with tempfile.TemporaryDirectory() as d:
            make_tum_dir(d)
            frames = list(tum.load_sequence(d))
            assert len(frames) == 5
            f0 = frames[0]
            assert f0["image"].shape == (32, 40)
            np.testing.assert_allclose(f0["depth"], 1.0, atol=1e-4)
            np.testing.assert_allclose(frames[3]["depth"][0, 0], 1.3, atol=1e-4)
            # ground truth associated: pose tx = 0.1*i, quat identity (wxyz)
            np.testing.assert_allclose(frames[2]["gt_pose"][0], 0.2, atol=1e-6)
            np.testing.assert_allclose(frames[2]["gt_pose"][3], 1.0, atol=1e-6)

    def test_stride_and_limit(self):
        with tempfile.TemporaryDirectory() as d:
            make_tum_dir(d, n=10)
            frames = list(tum.load_sequence(d, max_frames=3, stride=2))
            assert len(frames) == 3
            assert abs(frames[1]["stamp"] - 100.2) < 1e-6

    def test_trajectory_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            stamps = [1.0, 2.0]
            poses = np.array([
                [1, 2, 3, 1, 0, 0, 0],       # identity quat wxyz
                [4, 5, 6, 0.7071, 0, 0, 0.7071],
            ], dtype=np.float32)
            p = os.path.join(d, "traj.txt")
            tum.write_trajectory(p, stamps, poses)
            gt = tum.read_groundtruth(p)
            assert len(gt) == 2
            np.testing.assert_allclose(gt[0][1], poses[0], atol=1e-5)
            np.testing.assert_allclose(gt[1][1], poses[1], atol=1e-4)

    def test_association_rejects_far_stamps(self):
        a = [(1.0, "a"), (2.0, "b")]
        b = [(1.001, "x"), (5.0, "y")]
        pairs = tum.associate(a, b)
        assert len(pairs) == 1
        assert pairs[0][1][1] == "x"
