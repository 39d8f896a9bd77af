"""Checkpoint/resume + metrics tests (SURVEY.md §5, P8)."""

import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu import metrics as metrics_mod
from uzliti_slam_tpu import pipeline
from uzliti_slam_tpu.config import SlamConfig
from uzliti_slam_tpu.io import storage, synthetic

KEY = jax.random.PRNGKey(0)


def small_config():
    return SlamConfig(node_capacity=32, edge_capacity=64, feats_per_node=32, scan_bins=90)


class TestStorage:
    def test_graph_roundtrip(self):
        g, _ = synthetic.make_pose_graph(KEY, 20, loop_closure_every=5)
        with tempfile.TemporaryDirectory() as d:
            storage.save_state(d, g, extra_meta={"note": "test"})
            g2 = storage.load_state(d, synthetic.make_pose_graph(KEY, 20, loop_closure_every=5)[0])
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            meta = storage.checkpoint_meta(d)
            assert meta["type"] == "GraphState"
            assert meta["extra"]["note"] == "test"

    def test_slam_state_roundtrip(self):
        cfg = small_config()
        st = pipeline.init_state(cfg, seed=3)
        # mutate a bit so it is not all zeros
        st = st._replace(n_keyframes=jnp.asarray(7, jnp.int32))
        with tempfile.TemporaryDirectory() as d:
            storage.save_state(d, st)
            st2 = storage.load_state(d, pipeline.init_state(cfg))
            assert int(st2.n_keyframes) == 7
            for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self):
        g, _ = synthetic.make_pose_graph(KEY, 20)
        g_big, _ = synthetic.make_pose_graph(KEY, 40)
        with tempfile.TemporaryDirectory() as d:
            storage.save_state(d, g)
            with pytest.raises(ValueError, match="shape mismatch"):
                storage.load_state(d, g_big)

    @pytest.mark.slow
    def test_resume_continues_solving(self):
        from uzliti_slam_tpu.graph import solver
        g, _ = synthetic.make_pose_graph(KEY, 30, loop_closure_every=5)
        with tempfile.TemporaryDirectory() as d:
            storage.save_state(d, g)
            g2 = storage.load_state(d, g)
            out, stats = solver.optimize(g2, solver.SolverConfig(iterations=5))
            assert np.isfinite(float(stats.chi2_history[-1]))


class TestMetrics:
    def test_stage_timing_and_summary(self):
        m = metrics_mod.Metrics()
        with m.stage("optimization"):
            pass
        with m.stage("optimization"):
            pass
        m.count("keyframes", 3)
        m.gauge("chi2", 1.5)
        s = m.summary()
        assert s["optimization_calls"] == 2
        assert s["optimization_ms_mean"] >= 0
        assert s["count_keyframes"] == 3
        assert s["gauge_chi2"] == 1.5
        line = json.loads(m.json_line())
        assert "optimization_ms_mean" in line

    def test_reset(self):
        m = metrics_mod.Metrics()
        m.count("x")
        m.reset()
        assert m.summary() == {}


class TestMatExport:
    def test_roundtrip_via_scipy(self, tmp_path):
        import numpy as np

        from uzliti_slam_tpu.graph import state as gstate
        from uzliti_slam_tpu.io import storage

        pytest.importorskip("scipy.io")
        import scipy.io

        g = gstate.empty_graph(8, 16)
        p = tmp_path / "graph.mat"
        storage.graph_to_mat(str(p), g)
        m = scipy.io.loadmat(str(p))
        assert m["pose"].shape == (8, 7)
        np.testing.assert_allclose(m["pose"][:, 3], 1.0)  # identity quats
        assert m["e_from"].shape == (16, 1)
