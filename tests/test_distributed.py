"""Two-process ``jax.distributed`` exercise (VERDICT r3 #9).

``multihost.initialize`` + ``pod_mesh`` substantiated with a REAL
multi-process world: two localhost CPU processes (2 devices each) join a
coordinator, build the host-major ("batch", "edge") pod mesh, and run

- the edge-sharded solve over all 4 global devices (psums cross the
  process boundary — the DCN path), and
- the fleet solve (instances sharded over the full pod),

asserting both match the single-process result. This is SURVEY §4's
multi-host substitute done with actual processes, not just a virtual mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import numpy as np
import jax

from uzliti_slam_tpu.parallel import multihost, sharded
from uzliti_slam_tpu.graph import solver
from uzliti_slam_tpu.io import synthetic
from jax.sharding import Mesh

pid = int(sys.argv[1])
coord = sys.argv[2]
multihost.initialize(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

mesh = multihost.pod_mesh()          # 2 hosts x 2 devices
assert mesh.shape["batch"] == 2 and mesh.shape["edge"] == 2
# every "edge" row must stay within one process (ICI domain)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1

cfg = solver.SolverConfig(iterations=10)

# --- edge-sharded solve across ALL processes (cross-process psum) ---
g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), 200, loop_closure_every=10)
g = sharded.pad_edges_to_multiple(g, 4)
emesh = Mesh(mesh.devices.reshape(-1), ("edge",))
g2, hist = jax.jit(
    lambda gr: sharded.optimize_sharded(gr, emesh, config=cfg)
)(g)
chi2_sharded = float(jax.device_get(hist[-1]))

# --- fleet solve over the full pod ---
keys = jax.random.split(jax.random.PRNGKey(1), 8)
graphs = jax.jit(jax.vmap(
    lambda k: synthetic.make_pose_graph(k, 64, loop_closure_every=8)[0]
))(keys)
solved = multihost.solve_fleet(graphs, mesh, cfg)
# the fleet result is sharded across non-addressable devices: reduce to a
# REPLICATED per-instance chi2 vector in-jit before fetching
from jax.sharding import NamedSharding, PartitionSpec as P
rep = NamedSharding(mesh, P())
chi2_fn = jax.jit(
    jax.vmap(lambda gr, p: solver.total_chi2(gr, p, 1.0)),
    out_shardings=rep,
)
chi2_fleet = np.asarray(jax.device_get(chi2_fn(graphs, solved.pose))).tolist()
print("RESULT " + json.dumps(
    {"pid": pid, "chi2_sharded": chi2_sharded, "chi2_fleet": chi2_fleet}
), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    wfile = tmp_path / "worker.py"
    wfile.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(wfile), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))

    # both processes agree (SPMD determinism across the DCN boundary)
    assert results[0]["chi2_sharded"] == pytest.approx(
        results[1]["chi2_sharded"], rel=1e-5
    )
    assert np.allclose(
        results[0]["chi2_fleet"], results[1]["chi2_fleet"], rtol=1e-5
    )

    # ...and match the single-process solve
    import jax

    from uzliti_slam_tpu.graph import solver
    from uzliti_slam_tpu.io import synthetic
    from uzliti_slam_tpu.parallel import sharded

    # generic fixed-iteration path, matching what the edge-sharded psum
    # loop runs (the default fast path would early-exit)
    cfg = solver.SolverConfig(iterations=10, mode="pcg", early_exit=False)
    g, _ = synthetic.make_pose_graph(jax.random.PRNGKey(0), 200, loop_closure_every=10)
    g = sharded.pad_edges_to_multiple(g, 4)
    _, stats = solver.optimize(g, cfg)
    ref = float(stats.chi2_history[-1])
    # psum reduction order differs from the single-chip sum: the LM
    # accept path can diverge by a float-noise-sized margin
    assert results[0]["chi2_sharded"] == pytest.approx(ref, rel=2e-2)

    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    graphs = jax.jit(jax.vmap(
        lambda k: synthetic.make_pose_graph(k, 64, loop_closure_every=8)[0]
    ))(keys)
    # per-instance reference at the resolved fleet preconditioner
    fleet_cfg = solver.SolverConfig(
        iterations=10, chain_dense_cutoff=16, chain_root_ns=True,
        dense_gathers=True,
    )
    for i in range(8):
        gi = jax.tree.map(lambda x: x[i], graphs)
        _, st = solver.optimize(gi, fleet_cfg)
        assert results[0]["chi2_fleet"][i] == pytest.approx(
            float(st.chi2_history[-1]), rel=2e-2
        )
