"""Config-system tests (the reference's yaml/dynamic_reconfigure tiers)."""

import json
import os
import tempfile

from uzliti_slam_tpu import config as cfg_mod


class TestConfig:
    def test_roundtrip(self):
        c = cfg_mod.SlamConfig()
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "cfg.json")
            cfg_mod.save_config(c, p)
            assert cfg_mod.load_config(p) == c

    def test_partial_override(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "cfg.json")
            with open(p, "w") as f:
                json.dump(
                    {"node_capacity": 99,
                     "solver": {"iterations": 7, "preconditioner": "chain"}},
                    f,
                )
            c = cfg_mod.load_config(p)
            assert c.node_capacity == 99
            assert c.solver.iterations == 7
            assert c.solver.preconditioner == "chain"
            # unspecified fields keep defaults
            assert c.edge_capacity == 2048
            assert c.frontend.max_keypoints == 300

    def test_configs_hashable_for_jit(self):
        # frozen dataclasses must be usable as static jit args
        c1 = cfg_mod.SlamConfig()
        c2 = cfg_mod.SlamConfig()
        assert hash(c1) == hash(c2)
        assert c1 == c2
