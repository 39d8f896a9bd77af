"""Per-phase wall-time breakdown of the TUM ingestion loop.

Buckets: loader (decode+associate iteration), host build (array convert),
dispatch (process_frame_chunk call returning), sync (np.asarray on the
chunk result), optimize epochs, final fetch. Run on the real TPU:

    python scripts/profile_tum.py [n_frames] [chunk]
"""
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROOT = "/tmp/uzslam_tum_full"


def main():
    import os

    import jax.numpy as jnp

    from uzliti_slam_tpu import pipeline
    from uzliti_slam_tpu.config import SlamConfig
    from uzliti_slam_tpu.frontend import camera as cam_mod
    from uzliti_slam_tpu.io import simulator, tum

    if not os.path.exists(os.path.join(ROOT, "rgb.txt")):
        print("generating dataset...")
        simulator.export_tum_dataset(ROOT, n_frames=1040)

    cfg = SlamConfig(node_capacity=1024, edge_capacity=8192)
    first = next(tum.load_sequence(ROOT, max_frames=1))
    h, w = first["image"].shape
    import json
    with open(os.path.join(ROOT, "params.json")) as fh:
        f_gen = json.load(fh)["f"]
    cam = cam_mod.PinholeCamera(
        fx=jnp.float32(f_gen), fy=jnp.float32(f_gen),
        cx=jnp.float32(w / 2), cy=jnp.float32(h / 2), width=w, height=h,
    )
    slam = pipeline.Slam(cfg, cam=cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 50

    t = dict(load=0.0, build=0.0, dispatch=0.0, opt=0.0)
    n = 0
    t_all0 = time.perf_counter()
    t_warm = None
    slam.optimize_every = 10**9  # opt timed separately below

    it = tum.load_sequence(ROOT, max_frames=N)
    while True:
        t0 = time.perf_counter()
        fr = next(it, None)
        t["load"] += time.perf_counter() - t0
        if fr is None:
            break
        n += 1
        t0 = time.perf_counter()
        img = np.asarray(fr["image"], np.uint8)
        dep = (np.asarray(fr["depth"]) * 1e3).astype(np.uint16)
        t["build"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        slam.enqueue_frame(img, dep, fr["odom_pose"], fr["stamp"], chunk=CHUNK)
        t["dispatch"] += time.perf_counter() - t0
        if slam._since_opt >= 50:
            t0 = time.perf_counter()
            slam.optimize()
            t["opt"] += time.perf_counter() - t0
        if t_warm is None and slam._n_kf_host >= CHUNK:
            t_warm = time.perf_counter()
    slam.flush_frames(CHUNK)
    t0 = time.perf_counter()
    jax.block_until_ready(slam.state.graph.pose)
    t["final_block"] = time.perf_counter() - t0
    wall = time.perf_counter() - t_all0
    warm = time.perf_counter() - (t_warm or t_all0)
    print(f"frames={n} wall={wall:.1f}s warm_fps={(n - CHUNK) / warm:.2f}")
    for k, v in t.items():
        print(f"  {k:12s} {v:7.2f}s  {1e3 * v / n:6.1f} ms/frame")


if __name__ == "__main__":
    main()
