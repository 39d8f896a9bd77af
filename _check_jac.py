import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from uzliti_slam_tpu.graph import factors
from uzliti_slam_tpu.ops import lie

key = jax.random.PRNGKey(7)
k1, k2, k3 = jax.random.split(key, 3)
def rand_pose(k, n, scale=1.0):
    ka, kb = jax.random.split(k)
    t = scale * jax.random.normal(ka, (n, 3))
    xi = 0.8 * jax.random.normal(kb, (n, 3))
    return jnp.concatenate([t, jax.vmap(lie.quat_from_axis_angle)(xi)], axis=-1).astype(jnp.float64)

n = 64
pi, pj, meas = rand_pose(k1, n), rand_pose(k2, n), rand_pose(k3, n, 0.5)
r1, Ji1, Jj1 = factors.batched_residual_jacobians(pi, pj, meas)
r2, Ji2, Jj2 = factors.batched_residual_jacobians_ad(pi, pj, meas)
print("r err ", float(jnp.max(jnp.abs(r1 - r2))))
print("Ji err", float(jnp.max(jnp.abs(Ji1 - Ji2))))
print("Jj err", float(jnp.max(jnp.abs(Jj1 - Jj2))))
# also near-zero rotation edges
pi0 = pi.at[:, 3:].set(jnp.array([1.0, 0, 0, 0]))
r1, Ji1, Jj1 = factors.batched_residual_jacobians(pi0, pi0, lie.pose_identity((n,)).astype(jnp.float64))
r2, Ji2, Jj2 = factors.batched_residual_jacobians_ad(pi0, pi0, lie.pose_identity((n,)).astype(jnp.float64))
print("small-angle Ji err", float(jnp.max(jnp.abs(Ji1 - Ji2))), "Jj", float(jnp.max(jnp.abs(Jj1 - Jj2))))
