import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic

def timeit(fn, reps=5, warm=2):
    for _ in range(warm): jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    return 1e3*(time.perf_counter()-t0)/reps

cfg = solver.SolverConfig()
for N, reps in ((1000, 10), (10_000, 5), (100_000, 3)):
    g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), N, loop_closure_every=10)
    jfull = jax.jit(lambda gg: solver.optimize(gg, cfg))
    t = timeit(lambda: jfull(g)[0].pose, reps=reps)
    _, stats = jfull(g)
    print("N=%d: %.2f ms  chi2=%.2f" % (N, t, float(stats.chi2_history[-1])))
