import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic

for N in (200, 5000):
    g, gt = synthetic.make_pose_graph(jax.random.PRNGKey(0), N, loop_closure_every=10)
    cfg = solver.SolverConfig()
    out, stats = jax.jit(lambda gg: solver.optimize(gg, cfg))(g)
    hist = np.asarray(stats.chi2_history)
    print(f"N={N}: chi2 {hist[0]:.1f} -> {hist[-1]:.3f}  accepted={int(np.sum(np.asarray(stats.accepted)))}")
    assert np.all(np.isfinite(np.asarray(out.pose)))
    assert hist[-1] < 0.1 * hist[0]
print("OK")
