"""Benchmark: pose-graph GN/LM solves per second on the flagship config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference sustains 1 optimization epoch/s (20 LM iterations,
g2o CSparse, ~500-1000-node local graph) on its robot CPU — its local-graph
optimize timer runs at 1 Hz (``iti_slam_launch/yaml/local_slam.yaml:17``,
20 iterations ``slam.yaml:51``). vs_baseline = solves_per_sec / 1.0 on a
1000-node, 20-LM-iteration equivalent problem.
"""

import json
import time

import jax

N_NODES = 1000
LM_ITERS = 20
PCG_ITERS = 32
WARMUP = 2
REPS = 10


def main():
    from uzliti_slam_tpu.graph import solver
    from uzliti_slam_tpu.io import synthetic

    g, _ = synthetic.make_pose_graph(
        jax.random.PRNGKey(0), N_NODES, loop_closure_every=10
    )
    cfg = solver.SolverConfig(iterations=LM_ITERS, pcg_iterations=PCG_ITERS)

    step = jax.jit(lambda gr: solver.optimize(gr, cfg)[0].pose)
    for _ in range(WARMUP):
        step(g).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = step(g)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS

    solves_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"pose_graph_lm_solves_per_sec_{N_NODES}n_{LM_ITERS}it",
                "value": round(solves_per_sec, 3),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
