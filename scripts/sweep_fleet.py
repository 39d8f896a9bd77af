"""Sweep fleet-solve configs at 4096x64 on TPU (smaller batch for speed)."""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from uzliti_slam_tpu.graph import solver  # noqa: E402
from uzliti_slam_tpu.io import synthetic  # noqa: E402

BATCH = 4096
REPS = 3

CONFIGS = {
    "r4_cutoff1_16cg": dict(pcg_iterations=16, chain_dense_cutoff=1),
    "cur_cutoff16ns_8cg": dict(pcg_iterations=8, chain_dense_cutoff=16,
                               chain_root_ns=True),
    "scanpath_cutoff16ns_8cg_r5": dict(pcg_iterations=8, chain_dense_cutoff=16,
                                       chain_root_ns=True, early_exit=False,
                                       precond_refresh=5),
    "scanpath_cutoff16ns_6cg_r5u2": dict(pcg_iterations=6, chain_dense_cutoff=16,
                                         chain_root_ns=True, early_exit=False,
                                         precond_refresh=5, unroll_pcg=2,
                                         unroll_lm=2),
    "scanpath_cutoff32ns_8cg_r5": dict(pcg_iterations=8, chain_dense_cutoff=32,
                                       chain_root_ns=True, early_exit=False,
                                       precond_refresh=5),
    "dense_8cg_r5": dict(pcg_iterations=8, chain_dense_cutoff=16,
                         chain_root_ns=True, early_exit=False,
                         precond_refresh=5, dense_gathers=True),
    "dense_6cg_r5_u2": dict(pcg_iterations=6, chain_dense_cutoff=16,
                            chain_root_ns=True, early_exit=False,
                            precond_refresh=5, dense_gathers=True,
                            unroll_pcg=2, unroll_lm=2),
    "dense_8cg_r5_u4": dict(pcg_iterations=8, chain_dense_cutoff=16,
                            chain_root_ns=True, early_exit=False,
                            precond_refresh=5, dense_gathers=True,
                            unroll_pcg=4, unroll_lm=5),
}


def run(name, kw):
    make = jax.jit(jax.vmap(
        lambda k: synthetic.make_pose_graph(k, 64, loop_closure_every=8)[0]
    ))
    batches = []
    for s in range(bench.WARMUP + REPS):
        keys = jax.random.split(jax.random.PRNGKey(s), BATCH)
        batches.append(jax.block_until_ready(make(keys)))
    cfg = solver.SolverConfig(iterations=20, **kw)
    step = jax.jit(jax.vmap(lambda gr: solver.optimize(gr, cfg)[0].pose))
    t = bench.timeit_distinct(step, batches)
    stats = jax.jit(jax.vmap(lambda gr: solver.optimize(gr, cfg)[1]))(batches[0])
    chi2 = float(jnp.mean(stats.chi2_history[:, -1]))
    print(json.dumps({"config": name, "ms": round(1e3 * t, 1),
                      "inst_per_sec": round(BATCH / t, 0),
                      "mean_chi2": round(chi2, 3)}), flush=True)


which = sys.argv[1:] or list(CONFIGS)
for name in which:
    run(name, CONFIGS[name])
