import glob, gzip, json, collections, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic

N = 100_000
g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), N, loop_closure_every=10)
cfg = solver.SolverConfig()
jfull = jax.jit(lambda gg: solver.optimize(gg, cfg)[0].pose)
jax.block_until_ready(jfull(g))
with jax.profiler.trace("/tmp/slamtrace"):
    jax.block_until_ready(jfull(g))

files = glob.glob("/tmp/slamtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = collections.Counter()
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid = ev.get("pid", 0)
            # keep device-side ops only heuristically via args
            agg[name] += ev["dur"]
print("top 30 ops by total us:")
for name, dur in agg.most_common(30):
    print("%10.1f ms  %s" % (dur/1e3, name[:110]))
