"""Occupancy-grid projection tests (SURVEY.md §7 phase 9)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.mapping import occupancy
from uzliti_slam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)
CFG = occupancy.GridConfig(size=128, resolution=0.1, max_range=6.0)


def graph_with_scan(pose_xyt=(0.0, 0.0, 0.0), wall_dist=2.0, n=1, bins=180):
    g = gstate.empty_graph(8, 8)
    p = lie.pose2_to_pose(jnp.asarray(pose_xyt, jnp.float32))
    g, slot = gstate.add_node(g, p, p, jnp.asarray(0.0))
    # scan: wall straight ahead (bearing 0) within +/- 30 deg
    ang = -np.pi + 2 * np.pi * (np.arange(bins) + 0.5) / bins
    ranges = np.full(bins, np.inf, np.float32)
    sel = np.abs(ang) < np.pi / 6
    ranges[sel] = wall_dist / np.cos(ang[sel])
    scans = jnp.zeros((8, bins)).at[0].set(jnp.asarray(ranges))
    sv = jnp.zeros(8, bool).at[0].set(True)
    return g, scans, sv


def world_to_cell(grid, xy, cfg=CFG):
    return (
        int(np.floor((xy[1] - float(grid.origin[1])) / cfg.resolution)),
        int(np.floor((xy[0] - float(grid.origin[0])) / cfg.resolution)),
    )


class TestProjection:
    def test_wall_marked_occupied_path_free(self):
        g, scans, sv = graph_with_scan()
        grid = occupancy.grid_init(g, CFG)
        grid = occupancy.project(grid, g, scans, sv, CFG)
        lo = np.asarray(grid.logodds)
        # cell at the wall straight ahead (x=2, y=0) occupied
        r, c = world_to_cell(grid, (2.0, 0.0))
        assert lo[r, c] > 0.5
        # halfway cell free
        r2, c2 = world_to_cell(grid, (1.0, 0.0))
        assert lo[r2, c2] < -0.5
        # behind the robot unknown
        r3, c3 = world_to_cell(grid, (-2.0, 0.0))
        assert lo[r3, c3] == 0.0

    def test_no_hit_ray_contributes_nothing(self):
        # inf rays carry no evidence (reference: invalid ranges skipped)
        g, scans, sv = graph_with_scan()
        grid = occupancy.grid_init(g, CFG)
        grid = occupancy.project(grid, g, scans, sv, CFG)
        lo = np.asarray(grid.logodds)
        r, c = world_to_cell(grid, (0.0, 2.0))
        assert lo[r, c] == 0.0
        r2, c2 = world_to_cell(grid, (-2.0, 0.0))
        assert lo[r2, c2] == 0.0

    def test_incremental_skips_projected(self):
        g, scans, sv = graph_with_scan()
        grid = occupancy.grid_init(g, CFG)
        grid1 = occupancy.project(grid, g, scans, sv, CFG)
        # projecting again without new nodes must not double-count
        grid2 = occupancy.project(grid1, g, scans, sv, CFG)
        np.testing.assert_allclose(
            np.asarray(grid2.logodds), np.asarray(grid1.logodds), atol=1e-6
        )

    def test_drift_triggers_rebuild(self):
        g, scans, sv = graph_with_scan()
        grid = occupancy.grid_init(g, CFG)
        grid1 = occupancy.project(grid, g, scans, sv, CFG)
        # move the node far (optimization shifted it): rebuild from scratch
        g2 = g._replace(pose=g.pose.at[0, 1].add(1.5))
        grid2 = occupancy.project(grid1, g2, scans, sv, CFG)
        lo = np.asarray(grid2.logodds)
        # wall now at (2, 1.5): occupied there, and the OLD wall cell was
        # wiped by the rebuild
        r, c = world_to_cell(grid2, (2.0, 1.5))
        assert lo[r, c] > 0.5
        r_old, c_old = world_to_cell(grid2, (2.0, 0.0))
        assert lo[r_old, c_old] <= 0.0

    def test_probability_and_ternary(self):
        g, scans, sv = graph_with_scan()
        grid = occupancy.project(occupancy.grid_init(g, CFG), g, scans, sv, CFG)
        p = np.asarray(occupancy.occupancy_probability(grid))
        assert p.min() >= 0 and p.max() <= 1
        t = np.asarray(occupancy.to_ternary(grid))
        r, c = world_to_cell(grid, (2.0, 0.0))
        assert t[r, c] == 100
        r2, c2 = world_to_cell(grid, (1.0, 0.0))
        assert t[r2, c2] == 0
        r3, c3 = world_to_cell(grid, (-2.0, 0.0))
        assert t[r3, c3] == -1

    def test_rotated_node(self):
        g, scans, sv = graph_with_scan(pose_xyt=(0.0, 0.0, np.pi / 2))
        grid = occupancy.project(occupancy.grid_init(g, CFG), g, scans, sv, CFG)
        lo = np.asarray(grid.logodds)
        # wall rotates with the robot: now at (0, 2)
        r, c = world_to_cell(grid, (0.0, 2.0))
        assert lo[r, c] > 0.5

    def test_jit(self):
        g, scans, sv = graph_with_scan()
        grid = occupancy.grid_init(g, CFG)
        f = jax.jit(lambda gr, gg, s, v: occupancy.project(gr, gg, s, v, CFG))
        out = f(grid, g, scans, sv)
        assert np.all(np.isfinite(np.asarray(out.logodds)))
