"""Sweep solver configs for the 1k-node 20-iter headline rung on TPU."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

CONFIGS = {
    "r4_chain_fixed20_12cg": dict(preconditioner="chain", pcg_iterations=12,
                                  mode="pcg", early_exit=False),
    "chain_early_12cg": dict(preconditioner="chain", pcg_iterations=12,
                             precond_refresh=5),
    "chain_early_8cg_r3": dict(preconditioner="chain", pcg_iterations=8,
                               precond_refresh=3),
    "wb_4cg_r3": dict(preconditioner="woodbury", pcg_iterations=4,
                      precond_refresh=3, chain_dense_cutoff=8,
                      direct_closure_cap=64),
    "wb_6cg_r2": dict(preconditioner="woodbury", pcg_iterations=6,
                      precond_refresh=2, chain_dense_cutoff=8,
                      direct_closure_cap=64),
    "chain_early_12cg_unroll": dict(preconditioner="chain", pcg_iterations=12,
                                    precond_refresh=5, unroll_pcg=4),
    # round-2 sweep: capture ALL ~100 closures of the 1k rung in the
    # Woodbury correction, vs leaner chain budgets
    "wb_4cg_r3_cap128": dict(preconditioner="woodbury", pcg_iterations=4,
                             precond_refresh=3, chain_dense_cutoff=8,
                             direct_closure_cap=128),
    "wb_3cg_r4_cap128": dict(preconditioner="woodbury", pcg_iterations=3,
                             precond_refresh=4, chain_dense_cutoff=8,
                             direct_closure_cap=128, woodbury_ns_iters=12),
    "wb_6cg_r3_cap128": dict(preconditioner="woodbury", pcg_iterations=6,
                             precond_refresh=3, chain_dense_cutoff=8,
                             direct_closure_cap=128),
    "chain_early_10cg_r4": dict(preconditioner="chain", pcg_iterations=10,
                                precond_refresh=4),
}

which = sys.argv[1:] or list(CONFIGS)
for name in which:
    kw = CONFIGS[name]
    t0 = time.perf_counter()
    t, chi2 = bench.bench_solver(1000, 20, kw.pop("pcg_iterations"), reps=20, **kw)
    print(json.dumps({"config": name, "ms": round(1e3 * t, 2),
                      "per_sec": round(1 / t, 1), "chi2": round(chi2, 2),
                      "setup_s": round(time.perf_counter() - t0, 1)}), flush=True)
