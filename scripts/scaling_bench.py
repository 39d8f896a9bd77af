"""Chip-count-parameterized scaling-efficiency harness.

Measures the edge-sharded LM solve (``parallel.sharded.optimize_sharded``)
at 1, 2, 4, ... D devices on the SAME graph and reports per-count wall
time + scaling efficiency vs the 1-device run — the harness for the
BASELINE ">=70% 2-host scaling efficiency" target.

Runs today on the virtual CPU mesh (no multi-chip hardware needed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --nodes 100000 --devices 1,2,4,8

and unchanged on real multi-chip TPU hardware later (drop the env vars;
``--devices`` up to ``len(jax.devices())``). Prints one JSON line per
device count plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (8 devices)")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from uzliti_slam_tpu.graph import solver
    from uzliti_slam_tpu.io import synthetic
    from uzliti_slam_tpu.parallel import sharded

    counts = [int(x) for x in args.devices.split(",")]
    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    cfg = solver.SolverConfig(iterations=args.iterations)

    g, _ = synthetic.make_pose_graph(
        jax.random.PRNGKey(0), args.nodes, loop_closure_every=10
    )
    g = sharded.pad_edges_to_multiple(g, max(counts))

    results = {}
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]), ("edge",))
        step = jax.jit(
            lambda gr: sharded.optimize_sharded(gr, mesh, config=cfg)[0].pose
        )
        jax.block_until_ready(step(g))  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = step(g)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / args.reps
        results[d] = t
        eff = results[counts[0]] * counts[0] / (t * d)
        print(json.dumps({
            "devices": d, "ms": round(1e3 * t, 2),
            "speedup": round(results[counts[0]] / t, 3),
            "efficiency": round(eff, 3),
        }))

    base = results[counts[0]]
    last = counts[-1]
    print(json.dumps({
        "metric": f"sharded_solve_scaling_efficiency_{args.nodes}n_{last}dev",
        "value": round(base * counts[0] / (results[last] * last), 3),
        "unit": "fraction",
        "note": "1.0 = perfect linear scaling vs the smallest device count",
    }))


if __name__ == "__main__":
    main()
