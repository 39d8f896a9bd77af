"""Offline full-scale dataset evaluation: TUM directory → pipeline → ATE.

The reference's entire verification story is offline dataset playback
(``iti_slam_launch/launch/dataset.launch:1-36``) plus TUM-format trajectory
export for ATE tooling (``fastfusion_projector.cpp:60-73``). This module is
that story for the TPU engine: drive ``io.tum.load_sequence`` (native PNG
decode + prefetcher) through the full ``Slam`` loop, then report

- ATE vs ground truth (and the raw-odometry baseline),
- ATE + chi2 parity vs the g2o-equivalent ``sparse_gn_oracle`` run on the
  very same final graph — the measurable form of "g2o-equivalent ATE"
  (BASELINE configs #1-2).

Usage:
    python -m uzliti_slam_tpu.eval --root /tmp/uzslam_tum --generate \
        [--cpu] [--frames N] [--stride K]
"""

from __future__ import annotations

import time


def run_tum_sequence(
    root: str,
    config=None,
    optimize_every: int = 25,
    chunk: int = 8,
    max_frames: int | None = None,
    stride: int = 1,
    oracle: bool = True,
    progress: bool = False,
    final_epochs: int = 4,
) -> dict:
    """Drive a TUM directory end-to-end; returns the metrics dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uzliti_slam_tpu import pipeline
    from uzliti_slam_tpu.config import SlamConfig
    from uzliti_slam_tpu.frontend import camera as cam_mod
    from uzliti_slam_tpu.io import simulator, synthetic, tum

    import dataclasses as _dc

    cfg = config or SlamConfig()
    # raw TUM png depth units (1/5000 m) ship losslessly as uint16
    cfg = _dc.replace(cfg, depth_scale=1.0 / tum.DEPTH_SCALE)
    # TUM freiburg-style intrinsics unless the caller supplied a camera
    first = next(tum.load_sequence(root, max_frames=1))
    h, w = first["image"].shape
    cam = cam_mod.PinholeCamera(
        fx=jnp.float32(tum.FR1_INTRINSICS["fx"] * w / 640.0),
        fy=jnp.float32(tum.FR1_INTRINSICS["fy"] * h / 480.0),
        cx=jnp.float32(w / 2.0),
        cy=jnp.float32(h / 2.0),
        width=w, height=h,
    )
    import json
    import os
    pfile = os.path.join(root, "params.json")
    if os.path.exists(pfile):
        with open(pfile) as fh:
            f_gen = json.load(fh)["f"]
        cam = cam._replace(
            fx=jnp.float32(f_gen), fy=jnp.float32(f_gen)
        )
    slam = pipeline.Slam(cfg, cam=cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = optimize_every

    # Prewarm the epoch programs on a THROWAWAY state (same static shapes
    # -> same compiled executables): the first optimize would otherwise
    # compile mid-stream and stall the live loop for tens of seconds on a
    # tunneled TPU. The reference pays its equivalent cost at process
    # startup (plugin/solver construction), not mid-run.
    import jax as _jax

    from uzliti_slam_tpu.mapping import occupancy as _occ

    # Post-playback polish config: the reference keeps re-optimizing on a
    # timer after playback ends; the offline equivalent runs the final
    # epochs with a DEEPER linear-solve budget — late loop closures
    # propagate down the chain through chi2-flat directions that the
    # live epochs' budget leaves unresolved (they move ATE, not chi2).
    polish_cfg = _dc.replace(
        cfg,
        solver=_dc.replace(
            cfg.solver, iterations=30, pcg_iterations=32,
            early_exit_tol=1e-9,
        ),
    )
    _throw = pipeline.init_state(cfg)
    _throw, _ = pipeline.optimize_epoch(_throw, cfg)
    _throw, _ = pipeline.optimize_epoch(_throw, polish_cfg)
    if cfg.project_map:
        _grid = _occ.grid_init(_throw.graph, cfg.grid)
        for _ff in (True, False):
            _grid = pipeline._project_map_jit(
                _grid, _throw.graph, _throw.scans, _throw.scan_valid,
                cfg.grid, force_full=_ff,
            )
    _jax.block_until_ready(_throw.graph.pose)

    gt_by_stamp: dict[float, np.ndarray] = {}
    odo_by_stamp: dict[float, np.ndarray] = {}
    n_frames = 0
    t0 = time.perf_counter()
    t_first = None

    def push(fr):
        # gate BEFORE transfer (enqueue_frame): non-keyframes never cross
        # the host->device wire — the reference's SensorRequest policy.
        # Native sensor dtypes: uint8 mono + uint16 depth in the png's
        # own 1/5000 m units (depth_scale above) — the keyframe body
        # accepts them directly, the quantization is exactly the
        # dataset's, and the transfer shrinks ~2.7x vs float32 (the
        # tunneled-TPU hot cost).
        return slam.enqueue_frame(
            np.asarray(fr["image"], np.uint8),
            np.round(np.asarray(fr["depth"]) * tum.DEPTH_SCALE).astype(np.uint16),
            np.asarray(fr["odom_pose"]),
            np.float32(fr["stamp"]),
            chunk=chunk,
        )

    for fr in tum.load_sequence(root, max_frames=max_frames, stride=stride):
        if fr["odom_pose"] is None:
            raise ValueError(
                "sequence has no odometry.txt — supply wheel odometry "
                "(the pipeline's odometry edges need it)"
            )
        key = round(float(fr["stamp"]), 4)
        if fr["gt_pose"] is not None:
            gt_by_stamp[key] = np.asarray(fr["gt_pose"])
        odo_by_stamp[key] = np.asarray(fr["odom_pose"])
        push(fr)
        n_frames += 1
        if t_first is None and slam._n_kf_host >= chunk:
            t_first = time.perf_counter()  # compile done after chunk 1
        if progress and n_frames % (chunk * 16) == 0:
            g = slam.state.graph
            print(
                f"  frame {n_frames}: {int(g.num_nodes)} nodes "
                f"{int(g.num_edges)} edges "
                f"({time.perf_counter() - t0:.0f}s)"
            )
    slam.flush_frames(chunk)
    # Final polish: the reference keeps re-optimizing on a timer after
    # playback ends (optimizationTimerCallback at optimize_graph_freq); a
    # few extra deep epochs on the complete graph are the offline
    # equivalent (see polish_cfg above; prewarmed, so no mid-run compile).
    slam.config = polish_cfg
    for _ in range(max(1, final_epochs)):
        stats = slam.optimize()
    jax.block_until_ready(slam.state.graph.pose)
    wall = time.perf_counter() - t0
    wall_warm = time.perf_counter() - (t_first or t0)

    g = slam.state.graph
    n = int(g.num_nodes)
    valid = np.asarray(g.node_valid[:n])
    stamps = np.asarray(g.stamp[:n])
    rows = [
        i for i in range(n)
        if valid[i] and round(float(stamps[i]), 4) in gt_by_stamp
    ]
    gt = jnp.asarray(np.stack([gt_by_stamp[round(float(stamps[i]), 4)] for i in rows]))
    odo = jnp.asarray(np.stack([odo_by_stamp[round(float(stamps[i]), 4)] for i in rows]))
    est = g.pose[jnp.asarray(rows)]
    ate_slam = float(synthetic.ate_rmse(est, gt))
    ate_odo = float(synthetic.ate_rmse(odo, gt))

    out = dict(
        n_frames=n_frames,
        n_keyframes=int(slam._n_kf_host),
        n_nodes=n,
        n_edges=int(g.num_edges),
        ate_slam_m=ate_slam,
        ate_odometry_m=ate_odo,
        chi2_final=float(stats.chi2_history[-1]),
        wall_s=wall,
        frames_per_s_warm=(n_frames - 8) / max(wall_warm, 1e-9),
    )
    if oracle:
        from uzliti_slam_tpu.graph import solver as gsolver
        from uzliti_slam_tpu.graph.oracle import sparse_gn_oracle

        t_or = time.perf_counter()
        oracle_poses = sparse_gn_oracle(g, iters=12)
        out["oracle_wall_s"] = time.perf_counter() - t_or
        ate_oracle = float(synthetic.ate_rmse(oracle_poses[jnp.asarray(rows)], gt))
        out["ate_oracle_m"] = ate_oracle
        out["ate_vs_oracle_m"] = float(
            synthetic.ate_rmse(est, oracle_poses[jnp.asarray(rows)])
        )
        chi_ours = float(gsolver.total_chi2(g, g.pose, 1.0))
        chi_oracle = float(gsolver.total_chi2(g, oracle_poses, 1.0))
        out["chi2_ours"] = chi_ours
        out["chi2_oracle"] = chi_oracle
        out["chi2_ratio_vs_oracle"] = chi_ours / max(chi_oracle, 1e-12)
        # the "g2o-equivalent ATE" parity number: ours within 10% of the
        # oracle's ATE (or better)
        out["ate_parity"] = ate_slam <= ate_oracle * 1.10 + 1e-4
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/uzslam_tum_full")
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--gen-frames", type=int, default=1040)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--optimize-every", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-oracle", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.generate:
        from uzliti_slam_tpu.io import simulator

        print(f"generating TUM dataset at {args.root} ...")
        t0 = time.perf_counter()
        simulator.export_tum_dataset(args.root, n_frames=args.gen_frames)
        print(f"  done ({time.perf_counter() - t0:.0f}s)")
    out = run_tum_sequence(
        args.root, max_frames=args.frames, stride=args.stride,
        optimize_every=args.optimize_every, oracle=not args.no_oracle,
        progress=True,
    )
    for k, v in out.items():
        print(f"  {k}: {v}")
    ok = out["ate_slam_m"] < out["ate_odometry_m"] and out.get("ate_parity", True)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
