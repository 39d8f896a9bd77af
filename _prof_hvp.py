import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic

N = 100_000
g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), N, loop_closure_every=10)
E = g.e_from.shape[0]
key = jax.random.PRNGKey(1)
Ji = jax.random.normal(key, (E, 6, 6))
W = jax.random.normal(key, (E, 6, 6))
v = jnp.ones((N, 6))
u = jnp.ones((E, 6))
ef, et = g.e_from, g.e_to

def timeit(fn, reps=10, warm=3):
    for _ in range(warm): jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    return 1e3*(time.perf_counter() - t0) / reps

print("E=%d sorted ef: %s" % (E, bool(jnp.all(ef[1:] >= ef[:-1]))))
jg = jax.jit(lambda: v[ef])
print("gather v[ef]: %.2f ms" % timeit(jg))
je = jax.jit(lambda: jnp.einsum("eij,ej->ei", Ji, u, precision=jax.lax.Precision.HIGHEST))
print("einsum (E,6,6)@(E,6): %.2f ms" % timeit(je))
je2 = jax.jit(lambda: jnp.einsum("eij,ej->ei", Ji, u))
print("einsum default prec: %.2f ms" % timeit(je2))
def unrolled():
    # elementwise over E: y[:, i] = sum_j Ji[:, i, j]*u[:, j]
    return sum(Ji[:, :, j] * u[:, j:j+1] for j in range(6))
ju = jax.jit(unrolled)
print("einsum hand-unrolled: %.2f ms" % timeit(ju))
js = jax.jit(lambda: jax.ops.segment_sum(u, ef, num_segments=N))
print("segment_sum unsorted-flag: %.2f ms" % timeit(js))
js2 = jax.jit(lambda: jax.ops.segment_sum(u, ef, num_segments=N, indices_are_sorted=True))
print("segment_sum sorted-flag: %.2f ms" % timeit(js2))
# scatter for et (unsorted truly)
js3 = jax.jit(lambda: jax.ops.segment_sum(u, et, num_segments=N))
print("segment_sum et: %.2f ms" % timeit(js3))
# full hvp current
damp = jnp.ones((N, 6))
free = jnp.ones((N,))
hvp = solver._make_hvp(g, Ji, Ji, W, damp, free)
jh = jax.jit(hvp)
print("full hvp: %.2f ms" % timeit(lambda: jh(v)))
