import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from uzliti_slam_tpu.graph import factors
from uzliti_slam_tpu.ops import lie

key = jax.random.PRNGKey(7)
def rand_pose(k, n, tscale, rscale):
    ka, kb = jax.random.split(k)
    t = tscale * jax.random.normal(ka, (n, 3))
    xi = rscale * jax.random.normal(kb, (n, 3))
    return jnp.concatenate([t, jax.vmap(lie.quat_from_axis_angle)(xi)], axis=-1).astype(jnp.float64)

for rs in [0.01, 0.05, 0.1, 0.3, 0.6]:
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(int(rs*1000)), 3)
    n = 64
    pi, pj, meas = rand_pose(k1, n, 1.0, rs), rand_pose(k2, n, 1.0, rs), rand_pose(k3, n, 0.5, rs)
    r1, Ji1, Jj1 = factors.batched_residual_jacobians(pi, pj, meas)
    r2, Ji2, Jj2 = factors.batched_residual_jacobians_ad(pi, pj, meas)
    ang = jnp.max(jnp.linalg.norm(r1[:, 3:], axis=-1))
    print(f"rscale {rs}: max|r_rot| {float(ang):.3f}  Ji {float(jnp.max(jnp.abs(Ji1-Ji2))):.2e}  Jj {float(jnp.max(jnp.abs(Jj1-Jj2))):.2e}")
