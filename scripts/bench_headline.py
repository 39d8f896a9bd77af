"""Quick single-rung benches for iteration (not the driver's bench.py).

Usage: python scripts/bench_headline.py [headline|fleet|occupancy|all]
"""
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    out = {}
    if which in ("headline", "all"):
        FAST = dict(preconditioner="chain", precond_refresh=5,
                    early_exit=False)
        # burn: first rung in a process measures 2-4x slow on this tunnel
        bench.bench_solver(100, 20, 12, reps=20, preconditioner="chain",
                           precond_refresh=5)
        t, chi2 = bench.bench_solver(1000, 20, 12, reps=30, **FAST)
        out["solve_1k_ms"] = round(1e3 * t, 2)
        out["solve_1k_per_sec"] = round(1.0 / t, 2)
        out["solve_1k_chi2"] = round(chi2, 2)
    if which in ("fleet", "all"):
        t, chi2 = bench.bench_batched_instances(4096, 64, 20, reps=3)
        out["batched_ms"] = round(1e3 * t, 2)
        out["batched_instance_solves_per_sec"] = round(4096 / t, 0)
        out["batched_fleet_mean_chi2"] = round(chi2, 3)
    if which in ("occupancy", "all"):
        t = bench.bench_projection(n_nodes=500, bins=360, reps=10)
        out["occupancy_project_500n_ms"] = round(1e3 * t, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
