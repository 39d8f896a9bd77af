"""ctypes bindings for the native runtime (auto-builds on first use).

Gracefully degrades: every wrapper has a pure-python fallback, so the
package works without a toolchain; with g++ present the .so is built once
and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libuzruntime.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _HERE], check=True, capture_output=True, timeout=120
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        # signatures
        lib.png_probe.restype = ctypes.c_int
        lib.png_decode_gray_f32.restype = ctypes.c_int
        lib.uidmap_create.restype = ctypes.c_void_p
        lib.uidmap_lookup.restype = ctypes.c_int32
        lib.uidmap_lookup.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.uidmap_insert.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib.uidmap_remove.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.uidmap_destroy.argtypes = [ctypes.c_void_p]
        lib.uidmap_size.restype = ctypes.c_long
        lib.uidmap_size.argtypes = [ctypes.c_void_p]
        lib.uidmap_insert_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        lib.uidmap_lookup_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        lib.spatial_create.restype = ctypes.c_void_p
        lib.spatial_create.argtypes = [ctypes.c_float]
        lib.spatial_destroy.argtypes = [ctypes.c_void_p]
        lib.spatial_insert.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_float, ctypes.c_float]
        lib.spatial_remove.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.spatial_query_radius.restype = ctypes.c_long
        lib.spatial_query_radius.argtypes = [
            ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_long]
        lib.spatial_size.restype = ctypes.c_long
        lib.spatial_size.argtypes = [ctypes.c_void_p]
        lib.deltalog_open.restype = ctypes.c_void_p
        lib.deltalog_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.deltalog_close.argtypes = [ctypes.c_void_p]
        lib.deltalog_append.restype = ctypes.c_int
        lib.deltalog_append.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long]
        lib.deltalog_open_read.restype = ctypes.c_void_p
        lib.deltalog_open_read.argtypes = [ctypes.c_char_p]
        lib.deltalog_close_read.argtypes = [ctypes.c_void_p]
        lib.deltalog_next.restype = ctypes.c_long
        lib.deltalog_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        lib.prefetch_create.restype = ctypes.c_void_p
        lib.prefetch_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.prefetch_submit.restype = ctypes.c_long
        lib.prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
        lib.prefetch_next.restype = ctypes.c_int
        lib.prefetch_next.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def decode_png_gray(path: str) -> np.ndarray:
    """Decode a PNG to float32 grayscale; native if available, else the
    pure-python reader in io/tum.py."""
    lib = _load()
    if lib is None:
        from uzliti_slam_tpu.io import tum
        return tum.read_png_gray(path)
    with open(path, "rb") as f:
        data = f.read()
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_probe(
        buf.ctypes.data_as(ctypes.c_void_p), len(data),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"png_probe failed ({rc}): {path}")
    out = np.empty((h.value, w.value), dtype=np.float32)
    rc = lib.png_decode_gray_f32(
        buf.ctypes.data_as(ctypes.c_void_p), len(data),
        out.ctypes.data_as(ctypes.c_void_p), out.size,
    )
    if rc != 0:
        raise ValueError(f"png_decode failed ({rc}): {path}")
    return out


# ---------------------------------------------------------------------------
# Uid map
# ---------------------------------------------------------------------------

class UidMap:
    """uid -> slot map; native hashmap or python dict fallback."""

    def __init__(self):
        self._lib = _load()
        if self._lib:
            self._h = self._lib.uidmap_create()
        else:
            self._d = {}

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.uidmap_destroy(self._h)
            self._h = None

    def insert(self, uid: int, slot: int):
        if self._lib:
            self._lib.uidmap_insert(self._h, uid, slot)
        else:
            self._d[uid] = slot

    def lookup(self, uid: int) -> int:
        if self._lib:
            return int(self._lib.uidmap_lookup(self._h, uid))
        return self._d.get(uid, -1)

    def remove(self, uid: int):
        if self._lib:
            self._lib.uidmap_remove(self._h, uid)
        else:
            self._d.pop(uid, None)

    def clear(self):
        """Drop all entries (rebuild-after-compaction path)."""
        if self._lib:
            self._lib.uidmap_destroy(self._h)
            self._h = self._lib.uidmap_create()
        else:
            self._d.clear()

    def insert_batch(self, uids: np.ndarray, slots: np.ndarray):
        if self._lib:
            u = np.ascontiguousarray(uids, dtype=np.int32)
            s = np.ascontiguousarray(slots, dtype=np.int32)
            self._lib.uidmap_insert_batch(
                self._h, u.ctypes.data_as(ctypes.c_void_p),
                s.ctypes.data_as(ctypes.c_void_p), len(u))
        else:
            for u, s in zip(uids, slots):
                self._d[int(u)] = int(s)

    def lookup_batch(self, uids: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(uids, dtype=np.int32)
        out = np.empty(len(u), dtype=np.int32)
        if self._lib:
            self._lib.uidmap_lookup_batch(
                self._h, u.ctypes.data_as(ctypes.c_void_p),
                out.ctypes.data_as(ctypes.c_void_p), len(u))
        else:
            for i, x in enumerate(u):
                out[i] = self._d.get(int(x), -1)
        return out

    def __len__(self):
        if self._lib:
            return int(self._lib.uidmap_size(self._h))
        return len(self._d)


# ---------------------------------------------------------------------------
# Spatial hash
# ---------------------------------------------------------------------------

class SpatialIndex:
    """2-D radius queries over node positions (getNodesWithinRadius
    equivalent, reference slam_graph.cpp:266-278 but O(r²/cell²) instead of
    a linear scan)."""

    def __init__(self, cell_size: float = 2.0):
        self._lib = _load()
        if self._lib:
            self._h = self._lib.spatial_create(cell_size)
        else:
            self._d = {}
        self._cell = cell_size

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.spatial_destroy(self._h)
            self._h = None

    def insert(self, slot: int, x: float, y: float):
        if self._lib:
            self._lib.spatial_insert(self._h, slot, x, y)
        else:
            self._d[slot] = (x, y)

    def remove(self, slot: int):
        if self._lib:
            self._lib.spatial_remove(self._h, slot)
        else:
            self._d.pop(slot, None)

    def query_radius(self, x: float, y: float, r: float, cap: int = 1024) -> np.ndarray:
        if self._lib:
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.spatial_query_radius(
                self._h, x, y, r, out.ctypes.data_as(ctypes.c_void_p), cap)
            return out[:n]
        r2 = r * r
        return np.array(
            [s for s, (px, py) in self._d.items()
             if (px - x) ** 2 + (py - y) ** 2 <= r2][:cap],
            dtype=np.int32,
        )

    def __len__(self):
        if self._lib:
            return int(self._lib.spatial_size(self._h))
        return len(self._d)


# ---------------------------------------------------------------------------
# Delta log
# ---------------------------------------------------------------------------

RECORD_NODE = 1
RECORD_EDGE = 2
RECORD_META = 3


class DeltaLog:
    """Append-only CRC-framed record log: the incremental per-keyframe
    persistence of the reference's rosbag storage (one record per node /
    edge / meta instead of one bag file per entity)."""

    def __init__(self, path: str, append: bool = True):
        self._lib = _load()
        self._path = path
        if self._lib:
            self._h = self._lib.deltalog_open(path.encode(), 1 if append else 0)
            if not self._h:
                raise OSError(f"cannot open {path}")
        else:
            self._f = open(path, "ab" if append else "wb")

    def append(self, rtype: int, payload: bytes):
        if self._lib:
            buf = np.frombuffer(payload, dtype=np.uint8)
            rc = self._lib.deltalog_append(
                self._h, rtype,
                buf.ctypes.data_as(ctypes.c_void_p) if len(buf) else None,
                len(buf))
            if rc != 0:
                raise OSError(f"deltalog append failed {rc}")
        else:
            import struct
            self._f.write(struct.pack("<III", 0x554C4F47, rtype, len(payload)))
            self._f.write(payload)
            self._f.write(struct.pack("<I", _py_crc(payload)))
            self._f.flush()

    def close(self):
        if self._lib and getattr(self, "_h", None):
            self._lib.deltalog_close(self._h)
            self._h = None
        elif getattr(self, "_f", None):
            self._f.close()
            self._f = None

    @staticmethod
    def read_all(path: str, max_record: int = 1 << 22):
        """Yield (type, payload) records; stops at first corruption."""
        lib = _load()
        if lib:
            f = lib.deltalog_open_read(path.encode())
            if not f:
                return
            buf = np.empty(max_record, dtype=np.uint8)
            t = ctypes.c_uint32()
            try:
                while True:
                    n = lib.deltalog_next(
                        f, ctypes.byref(t),
                        buf.ctypes.data_as(ctypes.c_void_p), max_record)
                    if n < 0:
                        break
                    yield int(t.value), bytes(buf[:n])
            finally:
                lib.deltalog_close_read(f)
        else:
            import struct
            with open(path, "rb") as f:
                while True:
                    hdr = f.read(12)
                    if len(hdr) < 12:
                        break
                    magic, rtype, n = struct.unpack("<III", hdr)
                    if magic != 0x554C4F47:
                        break
                    payload = f.read(n)
                    crc = struct.unpack("<I", f.read(4))[0]
                    if crc != _py_crc(payload):
                        break
                    yield rtype, payload


# ---------------------------------------------------------------------------
# Frame prefetcher (native data loader)
# ---------------------------------------------------------------------------


class FramePrefetcher:
    """Order-preserving async (rgb, depth) PNG loader.

    Native worker pool (runtime/prefetch.cpp) decoding ahead of the TPU
    pipeline — the dataset-playback analog of the reference's C++ camera
    listeners (``feature_extraction_service_node.h:44-58``). Python-thread
    fallback (same semantics) when the toolchain is absent.

    Usage::

        pf = FramePrefetcher(n_threads=2, capacity=4, max_pixels=640*480)
        for rgb_path, dep_path in pairs: pf.submit(rgb_path, dep_path)
        for _ in pairs: rgb, depth = pf.next()
        pf.close()

    Submission blocks once ``capacity`` frames are in flight, bounding
    memory; ``next()`` blocks until the next frame IN SUBMISSION ORDER is
    decoded.
    """

    def __init__(self, n_threads: int = 2, capacity: int = 4,
                 max_pixels: int = 640 * 480):
        self._lib = _load()
        self._max_pixels = max_pixels
        if self._lib:
            self._h = self._lib.prefetch_create(n_threads, capacity)
        else:
            import queue

            self._cap = capacity
            self._results: "queue.Queue" = queue.Queue()
            self._jobs: "queue.Queue" = queue.Queue()
            self._order = []
            self._done = {}
            self._next_seq = 0
            self._next_out = 0
            self._threads = [
                threading.Thread(target=self._py_worker, daemon=True)
                for _ in range(max(1, n_threads))
            ]
            self._cond = threading.Condition()
            for t in self._threads:
                t.start()

    # -- python fallback machinery --
    def _py_worker(self):
        from uzliti_slam_tpu.io import tum
        while True:
            item = self._jobs.get()
            if item is None:
                return
            seq, pa, pb = item
            try:
                a = tum.read_png_gray(pa) if pa else None
                b = tum.read_png_gray(pb) if pb else None
                res = (a, b)
            except Exception as e:  # delivered at its turn
                res = e
            with self._cond:
                self._done[seq] = res
                self._cond.notify_all()

    def submit(self, rgb_path: str, depth_path: str | None = None) -> int:
        if self._lib:
            return int(self._lib.prefetch_submit(
                self._h, rgb_path.encode(),
                depth_path.encode() if depth_path else None))
        with self._cond:
            while self._next_seq - self._next_out >= self._cap:
                self._cond.wait()
            seq = self._next_seq
            self._next_seq += 1
        self._jobs.put((seq, rgb_path, depth_path))
        return seq

    def next(self):
        """Blocking: (rgb float32 (H,W), depth float32 (H,W) | None)."""
        if self._lib:
            cap = self._max_pixels
            a = np.empty(cap, dtype=np.float32)
            b = np.empty(cap, dtype=np.float32)
            wa = ctypes.c_int(); ha = ctypes.c_int()
            wb = ctypes.c_int(); hb = ctypes.c_int()
            rc = self._lib.prefetch_next(
                self._h,
                a.ctypes.data_as(ctypes.c_void_p), cap,
                ctypes.byref(wa), ctypes.byref(ha),
                b.ctypes.data_as(ctypes.c_void_p), cap,
                ctypes.byref(wb), ctypes.byref(hb))
            if rc != 0:
                raise OSError(f"prefetch_next failed ({rc})")
            rgb = a[: wa.value * ha.value].reshape(ha.value, wa.value).copy()
            dep = None
            if wb.value > 0:
                dep = b[: wb.value * hb.value].reshape(hb.value, wb.value).copy()
            return rgb, dep
        with self._cond:
            seq = self._next_out
            while seq not in self._done:
                self._cond.wait()
            res = self._done.pop(seq)
            self._next_out += 1
            self._cond.notify_all()
        if isinstance(res, Exception):
            raise res
        return res

    def close(self):
        if self._lib and getattr(self, "_h", None):
            self._lib.prefetch_destroy(self._h)
            self._h = None
        elif getattr(self, "_threads", None):
            for _ in self._threads:
                self._jobs.put(None)
            for t in self._threads:
                t.join(timeout=5)
            self._threads = []


def _py_crc(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 & (-(crc & 1)))
        crc &= 0xFFFFFFFF
    return (~crc) & 0xFFFFFFFF
