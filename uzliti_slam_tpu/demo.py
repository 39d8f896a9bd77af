"""End-to-end demo: simulated RGB-D sequence through the full SLAM pipeline.

Usage:  python -m uzliti_slam_tpu.demo [--frames N] [--drift D] [--cpu]

Prints per-epoch progress and the final ATE vs ground truth / odometry —
the equivalent of replaying the reference's dataset launch and reading the
rviz overlay (``iti_slam_launch/launch/dataset.launch``).
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--drift", type=float, default=0.08)
    ap.add_argument("--length", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--roles", default="single",
        help="'single' (one instance) or 'local,global' (the reference's "
             "slam.launch dual-process topology run as two wired instances)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.roles == "local,global":
        return main_local_global(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uzliti_slam_tpu import pipeline
    from uzliti_slam_tpu.config import EdgeEstimationConfig, KeyframeConfig, SlamConfig
    from uzliti_slam_tpu.graph import state as gstate
    from uzliti_slam_tpu.io import simulator, synthetic

    cfg = SlamConfig(
        node_capacity=64,
        edge_capacity=256,
        feats_per_node=96,
        scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=args.frames, odom_drift=args.drift, length=args.length
    )
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 12

    t0 = time.perf_counter()
    n_kf = 0
    for i, fr in enumerate(frames):
        info = slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if info:
            n_kf += 1
            print(
                f"frame {i:3d}: keyframe #{n_kf} features={info['n_features']} "
                f"closure-candidates={info['n_candidates']} edges={info['n_edges_proposed']}"
            )
    stats = slam.optimize()
    dt = time.perf_counter() - t0

    g = slam.state.graph
    n = int(g.num_nodes)
    stamps = np.asarray(g.stamp[:n]).astype(int)
    gt = jnp.stack([frames[s]["gt_pose"] for s in stamps])
    odo = jnp.stack([frames[s]["odom_pose"] for s in stamps])
    ate = float(synthetic.ate_rmse(g.pose[:n], gt))
    ate_odo = float(synthetic.ate_rmse(odo, gt))
    ne = int(g.num_edges)
    et = np.asarray(g.e_type[:ne])
    ev = np.asarray(g.e_valid[:ne])
    lc = et == gstate.EDGE_TYPE_3D_FULL

    print(f"\n== {n} keyframes, {ne} edges "
          f"({(et == gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY).sum()} odom, "
          f"{(et == gstate.EDGE_TYPE_2D_LASER).sum()} laser, "
          f"{lc.sum()} visual closures, {ev[lc].sum()} validated)")
    tern = np.asarray(slam.map_ternary())
    print(f"== map {tern.shape[0]}x{tern.shape[1]} @ {cfg.grid.resolution} m: "
          f"{(tern == 100).sum()} occupied, {(tern == 0).sum()} free, "
          f"{(tern == -1).sum()} unknown cells")
    print(f"== chi2 {float(stats.chi2_history[0]):.3f} -> {float(stats.chi2_history[-1]):.3f}")
    print(f"== ATE slam {ate:.4f} m  vs odometry {ate_odo:.4f} m  ({dt:.1f}s wall)")
    ok = ate < 0.2 and ate < ate_odo
    print("== RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main_local_global(args):
    """Two live SLAM instances + scope protocol end-to-end
    (``slam.launch:1-22``): local ingests and stays bounded, global
    accumulates + merges + optimizes; the exchange runs every few frames
    (the reference's 1 Hz scope timer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uzliti_slam_tpu import runner
    from uzliti_slam_tpu.config import (
        EdgeEstimationConfig, KeyframeConfig, ScopeConfig, SlamConfig,
    )
    from uzliti_slam_tpu.io import simulator, synthetic

    cfg = SlamConfig(
        node_capacity=64, edge_capacity=256, feats_per_node=96,
        scan_bins=180,
        keyframe=KeyframeConfig(new_node_distance=0.25),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
        scope=ScopeConfig(scope_size_min=3.0, eviction_margin=1.0),
    )
    world = simulator.WallWorld(img_h=96, img_w=128)
    frames = simulator.simulate_sequence(
        world, n_frames=args.frames, odom_drift=args.drift, length=args.length
    )
    duo = runner.LocalGlobalSlam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    duo.local.optimize_every = 12

    import time
    t0 = time.perf_counter()
    for i, fr in enumerate(frames):
        duo.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
        if (i + 1) % 6 == 0:
            ex = duo.exchange()
            print(f"frame {i:3d}: exchange acked={ex['acked_nodes']} "
                  f"evicted_local={ex['evicted_local']} "
                  f"merged_global={ex['merged_global']} "
                  f"proposed_global={ex['proposed_global']}")
    # drain the resend queue
    for _ in range(8):
        duo.exchange()
    dt = time.perf_counter() - t0

    poses, uids, stamps = duo.global_trajectory()
    keyframe_rows = uids < 1_000_000  # instance 0 = local-minted nodes
    stamps_i = stamps[keyframe_rows].astype(int)
    gt = jnp.stack([frames[s]["gt_pose"] for s in stamps_i])
    ate = float(synthetic.ate_rmse(jnp.asarray(poses[keyframe_rows]), gt))
    n_local = int(np.asarray(duo.local.state.graph.node_valid).sum())
    print(f"\n== global map: {len(poses)} nodes ({keyframe_rows.sum()} keyframes); "
          f"local window: {n_local} live nodes")
    tern = np.asarray(duo.global_slam.map_ternary())
    print(f"== global occupancy {tern.shape[0]}x{tern.shape[1]}: "
          f"{(tern == 100).sum()} occupied, {(tern == 0).sum()} free")
    print(f"== global ATE {ate:.4f} m  ({dt:.1f}s wall)")
    ok = ate < 0.25 and n_local < len(poses)
    print("== RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
