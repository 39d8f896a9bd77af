"""Multi-host (pod-slice) execution helpers.

The reference scales across machines by launching more ROS processes and
piping graph deltas over TCPROS (``slam.launch``).  Here the same jitted
programs run SPMD across hosts: ``jax.distributed`` forms one global device
mesh, intra-host reductions ride ICI, cross-host reductions ride DCN — the
scope/delta protocol (``parallel/scope.py``) remains for the
*asynchronous* local/global split, while the *synchronous* solve shards
over everything.

Mesh recipe (BASELINE.md pod-scale config — 4096 instances + 100k-node
graphs over N ≥ 2 hosts):

- axes ``("batch", "edge")``: independent SLAM instances sharded over
  ``batch`` (pure data parallel, no cross-instance traffic — place it on
  DCN), edge table of each solve sharded over ``edge`` (psum-heavy —
  place it on ICI within a host).

This module only *arranges* devices; the solvers in ``sharded.py`` are
already mesh-agnostic.  On a single host it degrades to the local devices
(so everything here is exercised by the CPU test mesh).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from uzliti_slam_tpu.graph.solver import SolverConfig
from uzliti_slam_tpu.parallel import sharded


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None, pod: bool = False) -> None:
    """Join the multi-host world.

    With no arguments this is a no-op (single-process runs, tests).  Pass
    ``pod=True`` on TPU pods to let ``jax.distributed.initialize()``
    autodetect the topology from the environment, or give explicit
    coordinator/num_processes/process_id for manual DCN setups — any
    explicit argument triggers initialization.
    """
    if pod or any(a is not None for a in (coordinator, num_processes, process_id)):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def pod_mesh(batch_axis: int | None = None, edge_axis: int | None = None) -> Mesh:
    """Global ("batch", "edge") mesh over all hosts' devices.

    Default split: ``batch`` = number of hosts (DCN boundary), ``edge`` =
    devices per host (ICI domain) — collectives of the edge-sharded solve
    stay on ICI, instance parallelism crosses DCN only at dispatch.
    Devices are grouped by owning process so each "edge" row stays inside
    one host (raw ``jax.devices()`` order is not guaranteed host-major).
    Overriding one axis derives the other from the device count.
    """
    # host-major ordering: group by process, stable within a process
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_dev = len(devices)
    n_hosts = max(jax.process_count(), 1)
    per_host = n_dev // n_hosts
    if batch_axis is not None and edge_axis is None:
        b, e = batch_axis, n_dev // batch_axis
    elif edge_axis is not None and batch_axis is None:
        b, e = n_dev // edge_axis, edge_axis
    else:
        b = batch_axis if batch_axis is not None else n_hosts
        e = edge_axis if edge_axis is not None else per_host
    if b * e != n_dev:
        raise ValueError(f"mesh {b}x{e} != {n_dev} devices")
    arr = np.array(devices).reshape(b, e)
    return Mesh(arr, ("batch", "edge"))


def solve_fleet(
    graphs,
    mesh: Mesh | None = None,
    config: SolverConfig = SolverConfig(),
):
    """Optimize a fleet of independent SLAM instances (leading batch dim)
    across the pod.

    Instances shard over BOTH mesh axes (flattened) — every device owns a
    slice of the fleet; there is no cross-instance communication, so DCN
    only carries dispatch.  For graphs too large for one device, use
    ``sharded.optimize_sharded`` on an ("edge",)-only mesh instead.
    """
    mesh = mesh or pod_mesh()
    return sharded.optimize_batch(graphs, mesh, tuple(mesh.axis_names), config)
