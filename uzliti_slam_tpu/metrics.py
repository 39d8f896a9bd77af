"""Structured runtime metrics and stage timing.

Replaces the reference's ``ROS_DEBUG_NAMED("runtime"|"time", ...)``
wall-clock probes (``graph_slam_node.cpp:394-398`` et al.) with a
lightweight registry: named stage timers (same taxonomy as the reference's
debug channels), counters, and gauges, exportable as one dict/JSON line.
``jax.profiler`` trace hooks cover on-device timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax

# The reference's debug-channel taxonomy (SURVEY.md §5).
STAGES = (
    "frontend", "place_recognition", "edge_estimation", "edge_filter",
    "optimization", "projection", "merge", "storage",
)


class Metrics:
    def __init__(self):
        self.timings = defaultdict(list)
        self.counters = defaultdict(int)
        self.gauges = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        """Host wall-clock span. NOTE: does not synchronize devices — for
        async-dispatched jax work, block inside the span (e.g.
        ``jax.block_until_ready``) if device time should be attributed.

        The span is also emitted as a ``jax.profiler.TraceAnnotation`` so
        that when a ``device_trace`` is active the stage taxonomy shows up
        on the TensorBoard timeline alongside the XLA ops it dispatched."""
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            try:
                yield
            finally:
                self.timings[name].append(time.perf_counter() - t0)

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    def gauge(self, name: str, value):
        self.gauges[name] = float(value)

    def summary(self) -> dict:
        out = {}
        for name, vals in self.timings.items():
            out[f"{name}_ms_mean"] = 1000 * sum(vals) / len(vals)
            out[f"{name}_ms_total"] = 1000 * sum(vals)
            out[f"{name}_calls"] = len(vals)
        out.update({f"count_{k}": v for k, v in self.counters.items()})
        out.update({f"gauge_{k}": v for k, v in self.gauges.items()})
        return out

    def json_line(self) -> str:
        return json.dumps(
            {k: round(v, 4) if isinstance(v, float) else v
             for k, v in self.summary().items()},
            sort_keys=True,
        )

    def reset(self):
        self.timings.clear()
        self.counters.clear()
        self.gauges.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace for TensorBoard (on-device timeline)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
