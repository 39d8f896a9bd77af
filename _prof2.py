import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from uzliti_slam_tpu.graph import solver, tridiag
from uzliti_slam_tpu.io import synthetic

# correctness of new _inv6
key = jax.random.PRNGKey(0)
X = jax.random.normal(key, (128, 6, 6))
M = X @ jnp.swapaxes(X, -1, -2) + 0.5 * jnp.eye(6)
Minv = tridiag._inv6(M)
err = jnp.max(jnp.abs(Minv @ M - jnp.eye(6)))
print("inv6 err:", float(err))

N = 100_000
g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), N, loop_closure_every=10)
cfg = solver.SolverConfig()
labels = solver.connected_components(g)
gauge = solver.gauge_fix_mask(g, labels)
free = (g.node_valid & ~gauge).astype(g.pose.dtype)

def timeit(fn, reps=5, warm=2):
    for _ in range(warm): jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    return 1e3*(time.perf_counter()-t0)/reps

lin = jax.jit(lambda gg: solver._build_linearization(gg, cfg.huber_delta))
r, Ji, Jj, W = lin(g)
print("linearize (analytic): %.2f ms" % timeit(lambda: lin(g)))
Hb = jax.jit(lambda: solver._hessian_diag_blocks(g, Ji, Jj, W))()
damp = 1e-4 * jnp.maximum(jax.vmap(jnp.diag)(Hb), 1e-6)

for cutoff in (64, 512):
    def cf(cut=cutoff):
        U = tridiag.chain_offdiag_blocks(g, Ji, Jj, W, free)
        eye = jnp.eye(6)
        Dm = jnp.where(free[:, None, None] > 0, Hb + jax.vmap(jnp.diag)(damp), eye)
        return tridiag.block_tridiag_factor(Dm, U, dense_cutoff=cut)
    jcf = jax.jit(cf)
    fac = jcf()
    print("chain factor (cutoff %d): %.2f ms" % (cutoff, timeit(jcf)))
    lv, ri = fac[0], fac[1]
    japply = jax.jit(lambda vv: tridiag.block_tridiag_apply((lv, ri, N), vv))
    v = jnp.ones((N, 6))
    print("tridiag apply (cutoff %d): %.2f ms" % (cutoff, timeit(lambda: japply(v))))

jfull = jax.jit(lambda gg: solver.optimize(gg, cfg)[0].pose)
print("FULL solve: %.2f ms" % timeit(lambda: jfull(g), reps=3))
