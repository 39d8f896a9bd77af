"""Benchmarks: pose-graph solves, keyframe pipeline, scale configs.

Prints ONE headline JSON line {"metric", "value", "unit", "vs_baseline"};
all config results also go to BENCH_DETAILS.json.

Baseline: the reference sustains 1 optimization epoch/s (20 LM iterations,
g2o CSparse, local graph) on its robot CPU (local optimize timer 1 Hz,
``iti_slam_launch/yaml/local_slam.yaml:17``; 20 iterations
``slam.yaml:51``), and processes Kinect frames at ~5 Hz effective
(30 Hz / data_skip 5, ``live.yaml:2-3``).
"""

import json
import time

import jax
import numpy as np

WARMUP = 2


def timeit(fn, reps):
    for _ in range(WARMUP):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_solver(n_nodes, lm_iters, pcg_iters, reps, preconditioner="jacobi"):
    from uzliti_slam_tpu.graph import solver
    from uzliti_slam_tpu.io import synthetic

    g, _ = synthetic.make_pose_graph(
        jax.random.PRNGKey(0), n_nodes, loop_closure_every=10
    )
    cfg = solver.SolverConfig(
        iterations=lm_iters, pcg_iterations=pcg_iters,
        preconditioner=preconditioner,
    )
    step = jax.jit(lambda gr: solver.optimize(gr, cfg))
    t = timeit(lambda: step(g)[0].pose, reps)
    out, stats = step(g)
    return t, float(jax.device_get(stats.chi2_history[-1]))


def bench_batched_instances(batch, n_nodes, lm_iters, reps):
    import jax.numpy as jnp
    from uzliti_slam_tpu.graph import solver
    from uzliti_slam_tpu.io import synthetic

    g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), n_nodes, loop_closure_every=8)
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), g)
    cfg = solver.SolverConfig(iterations=lm_iters, pcg_iterations=16)
    step = jax.jit(jax.vmap(lambda gr: solver.optimize(gr, cfg)[0].pose))
    return timeit(lambda: step(batched), reps)


def bench_keyframe_pipeline(reps=10):
    from uzliti_slam_tpu import pipeline
    from uzliti_slam_tpu.config import EdgeEstimationConfig, KeyframeConfig, SlamConfig
    from uzliti_slam_tpu.io import simulator

    cfg = SlamConfig(
        node_capacity=512, edge_capacity=2048, feats_per_node=256, scan_bins=360,
        keyframe=KeyframeConfig(new_node_distance=0.0, new_node_angle_deg=0.0),
        estimation=EdgeEstimationConfig(min_consensus=10, min_matching_score=8.0),
    )
    world = simulator.WallWorld(img_h=480, img_w=640, f=525.0)
    frames = simulator.simulate_sequence(world, n_frames=reps + 3, odom_drift=0.05, length=6.0)
    # a live robot feeds HOST sensor data; device arrays from the simulator
    # would force a device->host sync in the keyframe gate every frame
    frames = [
        {k: (v if k == "stamp" else np.asarray(v)) for k, v in fr.items()}
        for fr in frames
    ]
    slam = pipeline.Slam(cfg, cam=world.cam, cam_pose=simulator.cam_extrinsic())
    slam.optimize_every = 10**9
    for fr in frames[:3]:
        slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
    jax.block_until_ready(slam.state.graph.pose)
    t0 = time.perf_counter()
    for fr in frames[3:]:
        slam.add_frame(fr["image"], fr["depth"], fr["odom_pose"], fr["stamp"])
    jax.block_until_ready(slam.state.graph.pose)
    return (time.perf_counter() - t0) / len(frames[3:])


def main():
    details = {"platform": jax.devices()[0].platform}

    t, chi2 = bench_solver(1000, 20, 32, reps=10)
    headline = 1.0 / t
    details["solve_1k_20it_ms"] = round(1e3 * t, 2)
    details["solve_1k_solves_per_sec"] = round(headline, 2)
    details["solve_1k_chi2"] = round(chi2, 2)

    t, chi2 = bench_solver(1000, 10, 6, reps=10, preconditioner="chain")
    details["solve_1k_chain_10x6_ms"] = round(1e3 * t, 2)
    details["solve_1k_chain_chi2"] = round(chi2, 2)

    t, chi2 = bench_solver(10_000, 20, 48, reps=5)
    details["solve_10k_20it_ms"] = round(1e3 * t, 2)
    details["solve_10k_solves_per_sec"] = round(1.0 / t, 3)
    details["solve_10k_chi2"] = round(chi2, 2)

    t = bench_batched_instances(4096, 64, 5, reps=3)
    details["batched_4096x64n_ms"] = round(1e3 * t, 2)
    details["batched_instance_solves_per_sec"] = round(4096 / t, 0)

    t = bench_keyframe_pipeline(reps=10)
    details["keyframe_vga_ms"] = round(1e3 * t, 2)
    details["keyframe_hz"] = round(1.0 / t, 2)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "pose_graph_lm_solves_per_sec_1000n_20it",
                "value": round(headline, 3),
                "unit": "solves/s",
                "vs_baseline": round(headline / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
