import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__
fn, args = __graft_entry__.entry()
out = jax.jit(fn).lower(*args).compile()
print("entry() compile OK")
__graft_entry__.dryrun_multichip(8)
print("dryrun_multichip(8) OK")
