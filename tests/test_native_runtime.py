"""Native C++ runtime tests: PNG decode parity, uid map, spatial index,
delta log (cross-checked against python fallbacks)."""

import os
import tempfile

import numpy as np
import pytest

from uzliti_slam_tpu.runtime import native
from test_tum import write_png_gray, make_tum_dir  # reuse fixtures


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


class TestPngDecode:
    def test_parity_with_python_reader(self):
        from uzliti_slam_tpu.io import tum
        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as d:
            for depth, arr in [
                (8, rng.integers(0, 255, (33, 47)).astype(np.uint8)),
                (16, rng.integers(0, 65535, (24, 31)).astype(np.uint16)),
            ]:
                p = os.path.join(d, f"t{depth}.png")
                write_png_gray(p, arr, depth)
                a = native.decode_png_gray(p)
                b = tum.read_png_gray(p)
                np.testing.assert_allclose(a, b, atol=0.01)
                np.testing.assert_allclose(a, arr.astype(np.float32), atol=0.01)

    def test_decodes_real_filtered_pngs(self):
        # matplotlib writes filtered RGBA pngs — decode must handle
        # filters 1-4 and channel conversion
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with tempfile.TemporaryDirectory() as d:
            fig, ax = plt.subplots(figsize=(2, 2))
            ax.plot([0, 1], [1, 0])
            p = os.path.join(d, "fig.png")
            fig.savefig(p)
            plt.close(fig)
            img = native.decode_png_gray(p)
            assert img.ndim == 2 and img.size > 100
            assert np.isfinite(img).all()
            assert img.max() > 100  # white background

    def test_garbage_rejected(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "bad.png")
            with open(p, "wb") as f:
                f.write(b"not a png at all")
            with pytest.raises(ValueError):
                native.decode_png_gray(p)


class TestUidMap:
    def test_basic(self):
        m = native.UidMap()
        m.insert(1000001, 5)
        m.insert(1000002, 7)
        assert m.lookup(1000001) == 5
        assert m.lookup(42) == -1
        m.remove(1000001)
        assert m.lookup(1000001) == -1
        assert len(m) == 1

    def test_batch(self):
        m = native.UidMap()
        uids = np.arange(100, dtype=np.int32) + 10
        slots = np.arange(100, dtype=np.int32)
        m.insert_batch(uids, slots)
        out = m.lookup_batch(np.array([10, 109, 999], dtype=np.int32))
        np.testing.assert_array_equal(out, [0, 99, -1])


class TestSpatialIndex:
    def test_radius_query(self):
        s = native.SpatialIndex(cell_size=1.0)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, (200, 2)).astype(np.float32)
        for i, (x, y) in enumerate(pts):
            s.insert(i, float(x), float(y))
        got = set(s.query_radius(0.0, 0.0, 3.0).tolist())
        expect = {i for i, (x, y) in enumerate(pts) if x * x + y * y <= 9.0}
        assert got == expect

    def test_update_position(self):
        s = native.SpatialIndex(1.0)
        s.insert(1, 0.0, 0.0)
        s.insert(1, 50.0, 50.0)  # move
        assert s.query_radius(0, 0, 1.0).size == 0
        assert set(s.query_radius(50, 50, 1.0).tolist()) == {1}
        assert len(s) == 1

    def test_remove(self):
        s = native.SpatialIndex(1.0)
        s.insert(3, 1.0, 1.0)
        s.remove(3)
        assert s.query_radius(1, 1, 2.0).size == 0


class TestDeltaLog:
    def test_append_read_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "log.bin")
            log = native.DeltaLog(p, append=False)
            log.append(native.RECORD_NODE, b"node-payload-1")
            log.append(native.RECORD_EDGE, b"edge-payload-2")
            log.append(native.RECORD_META, b"")
            log.close()
            recs = list(native.DeltaLog.read_all(p))
            assert recs == [
                (native.RECORD_NODE, b"node-payload-1"),
                (native.RECORD_EDGE, b"edge-payload-2"),
                (native.RECORD_META, b""),
            ]

    def test_append_mode_accumulates(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "log.bin")
            l1 = native.DeltaLog(p, append=False)
            l1.append(1, b"a")
            l1.close()
            l2 = native.DeltaLog(p, append=True)
            l2.append(2, b"b")
            l2.close()
            assert [t for t, _ in native.DeltaLog.read_all(p)] == [1, 2]

    def test_truncated_tail_tolerated(self):
        """Crash mid-write: reader returns the intact prefix (the
        checkpointed-graph + idempotent-delta recovery story)."""
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "log.bin")
            log = native.DeltaLog(p, append=False)
            log.append(1, b"good-record")
            log.close()
            with open(p, "ab") as f:
                f.write(b"\x47\x4f\x4c\x55\x01\x00")  # torn header
            recs = list(native.DeltaLog.read_all(p))
            assert recs == [(1, b"good-record")]


class TestFramePrefetcher:
    """Native async data loader (runtime/prefetch.cpp): in-order delivery,
    bounded in-flight window, monocular mode, python fallback parity."""

    def _make_pngs(self, tmp_path, n=5):
        from PIL import Image as PILImage
        paths = []
        for i in range(n):
            a = (np.arange(32 * 40).reshape(32, 40) % 199 + i).astype(np.uint8)
            p = str(tmp_path / f"f{i}.png")
            PILImage.fromarray(a).save(p)
            paths.append(p)
        return paths

    def _drive(self, pf, paths):
        for p in paths[:2]:
            pf.submit(p, p)
        out = []
        for i in range(len(paths)):
            rgb, dep = pf.next()
            if i + 2 < len(paths):
                pf.submit(paths[i + 2], paths[i + 2])
            out.append((rgb, dep))
        pf.close()
        return out

    def test_in_order_and_content(self, tmp_path):
        from uzliti_slam_tpu.runtime import native
        paths = self._make_pngs(tmp_path)
        out = self._drive(native.FramePrefetcher(n_threads=2, capacity=3), paths)
        for i, (rgb, dep) in enumerate(out):
            ref = (np.arange(32 * 40).reshape(32, 40) % 199 + i).astype(np.float32)
            np.testing.assert_allclose(rgb, ref)
            np.testing.assert_allclose(dep, ref)

    def test_python_fallback_parity(self, tmp_path, monkeypatch):
        from uzliti_slam_tpu.runtime import native
        paths = self._make_pngs(tmp_path)
        pf = native.FramePrefetcher.__new__(native.FramePrefetcher)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_build_failed", True)
        pf.__init__(n_threads=2, capacity=3)
        assert pf._lib is None
        out = self._drive(pf, paths)
        for i, (rgb, dep) in enumerate(out):
            ref = (np.arange(32 * 40).reshape(32, 40) % 199 + i).astype(np.float32)
            np.testing.assert_allclose(rgb, ref)
            np.testing.assert_allclose(dep, ref)

    def test_monocular(self, tmp_path):
        from uzliti_slam_tpu.runtime import native
        paths = self._make_pngs(tmp_path, n=1)
        pf = native.FramePrefetcher(n_threads=1, capacity=2)
        pf.submit(paths[0], None)
        rgb, dep = pf.next()
        pf.close()
        assert dep is None and rgb.shape == (32, 40)
