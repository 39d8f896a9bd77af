"""Decide: does an E-in-lanes (6,6,E) layout beat (E,6,6) for the solver's
per-edge block algebra on TPU?"""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

E, N = 104_999, 100_000
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
Ji = jax.random.normal(k1, (E, 6, 6))
W = jax.random.normal(k2, (E, 6, 6))
r = jax.random.normal(k3, (E, 6))
ef = jax.random.randint(k4, (E,), 0, N)
Ji_t = jnp.transpose(Ji, (1, 2, 0))
W_t = jnp.transpose(W, (1, 2, 0))
r_t = r.T

def timeit(fn, reps=10, warm=3):
    for _ in range(warm): jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    return 1e3*(time.perf_counter()-t0)/reps

# chain: WJi = W@Ji ; Hii = Ji^T @ WJi  (the Hessian-diag inner work)
def cur():
    WJi = jnp.einsum("eij,ejk->eik", W, Ji)
    return jnp.einsum("eji,ejk->eik", Ji, WJi)
def trans():
    WJi = jnp.einsum("ije,jke->ike", W_t, Ji_t)
    return jnp.einsum("jie,jke->ike", Ji_t, WJi)
print("Hii chain (E,6,6): %.2f ms" % timeit(jax.jit(cur)))
print("Hii chain (6,6,E): %.2f ms" % timeit(jax.jit(trans)))

# matvec: Wr
print("matvec (E,6,6): %.2f ms" % timeit(jax.jit(lambda: jnp.einsum("eij,ej->ei", W, r))))
print("matvec (6,6,E): %.2f ms" % timeit(jax.jit(lambda: jnp.einsum("ije,je->ie", W_t, r_t))))

# transpose cost
print("transpose (E,6,6)->(6,6,E): %.2f ms" % timeit(jax.jit(lambda: jnp.transpose(W, (1, 2, 0)))))

# quat-ish ops: normalize + rotate on (E,4)/(E,3) vs (4,E)/(3,E)
q = jax.random.normal(k1, (E, 4)); v = jax.random.normal(k2, (E, 3))
q_t, v_t = q.T, v.T
def rot_cur():
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    t = 2 * jnp.cross(qn[:, 1:], v)
    return v + w[:, None] * t + jnp.cross(qn[:, 1:], t)
def rot_trans():
    qn = q_t / jnp.sqrt(jnp.sum(q_t * q_t, 0, keepdims=True))
    w = qn[0]; u = qn[1:]
    def cross(a, b):
        return jnp.stack([a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2], a[0]*b[1]-a[1]*b[0]])
    t = 2 * cross(u, v_t)
    return v_t + w * t + cross(u, t)
print("quat rotate (E,*): %.2f ms" % timeit(jax.jit(rot_cur)))
print("quat rotate (*,E): %.2f ms" % timeit(jax.jit(rot_trans)))

# scatter comparison: (E,6) vs (E,36) vs six (E,) scatters
u6 = jax.random.normal(k3, (E, 6))
print("segsum (E,6): %.2f ms" % timeit(jax.jit(lambda: jax.ops.segment_sum(u6, ef, num_segments=N))))
u36 = jax.random.normal(k3, (E, 36))
print("segsum (E,36): %.2f ms" % timeit(jax.jit(lambda: jax.ops.segment_sum(u36, ef, num_segments=N))))
def six_scat():
    return jnp.stack([jax.ops.segment_sum(u6[:, i], ef, num_segments=N) for i in range(6)], 1)
print("6x segsum (E,): %.2f ms" % timeit(jax.jit(six_scat)))
# gather comparison
vn = jax.random.normal(k4, (N, 6))
print("gather (N,6) rows: %.2f ms" % timeit(jax.jit(lambda: vn[ef])))
vt = vn.T
print("gather (6,N) cols: %.2f ms" % timeit(jax.jit(lambda: vt[:, ef])))
print("6x gather (N,): %.2f ms" % timeit(jax.jit(lambda: jnp.stack([vt[i][ef] for i in range(6)]))))
