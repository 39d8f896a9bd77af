"""Graph visualization: the rviz-marker equivalent.

Replaces the reference's Python visualization node
(``graph_slam_common/nodes/graph_visualization_node.py:16-60``: node
spheres + valid/invalid edge line lists published as rviz MarkerArrays)
with offline artifacts: a matplotlib figure (nodes, edges colored by
type/validity, occupancy underlay) and a JSON export with the same
structure as the marker arrays for external dashboards.
"""

from __future__ import annotations

import json

import numpy as np

from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.ops import lie


EDGE_COLORS = {
    gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY: ("#4477aa", "odometry"),
    gstate.EDGE_TYPE_2D_LASER: ("#66ccee", "laser"),
    gstate.EDGE_TYPE_3D_FULL: ("#228833", "visual closure"),
    gstate.EDGE_TYPE_3D_GPS: ("#ccbb44", "gps"),
}


def graph_to_dict(g, max_nodes: int | None = None) -> dict:
    """JSON-ready structure mirroring the reference's marker arrays."""
    n = int(g.num_nodes)
    e = int(g.num_edges)
    nv = np.asarray(g.node_valid[:n])
    poses = np.asarray(lie.pose_t(g.pose[:n]))
    nodes = [
        dict(slot=i, uid=int(np.asarray(g.node_uid[i])), xyz=poses[i].tolist(),
             stamp=float(np.asarray(g.stamp[i])), fixed=bool(np.asarray(g.node_fixed[i])))
        for i in range(n) if nv[i]
    ]
    if max_nodes:
        nodes = nodes[:max_nodes]
    ef = np.asarray(g.e_from[:e])
    et_ = np.asarray(g.e_to[:e])
    ev = np.asarray(g.e_valid[:e])
    ety = np.asarray(g.e_type[:e])
    err = np.asarray(g.e_error[:e])
    edges = [
        dict(frm=int(ef[i]), to=int(et_[i]), type=int(ety[i]),
             valid=bool(ev[i]), error=float(err[i]))
        for i in range(e)
    ]
    return dict(nodes=nodes, edges=edges)


def save_graph_json(path: str, g) -> None:
    with open(path, "w") as f:
        json.dump(graph_to_dict(g), f)


def plot_graph(
    g,
    path: str,
    grid=None,
    grid_config=None,
    title: str = "pose graph",
    gt_poses=None,
):
    """Render the graph (and optional occupancy underlay / ground truth)
    to a PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))

    if grid is not None and grid_config is not None:
        from uzliti_slam_tpu.mapping import occupancy as occ
        p = np.asarray(occ.occupancy_probability(grid))
        extent = [
            float(grid.origin[0]),
            float(grid.origin[0]) + grid_config.size * grid_config.resolution,
            float(grid.origin[1]),
            float(grid.origin[1]) + grid_config.size * grid_config.resolution,
        ]
        ax.imshow(1.0 - p, cmap="gray", origin="lower", extent=extent,
                  vmin=0, vmax=1, alpha=0.8)

    n = int(g.num_nodes)
    e = int(g.num_edges)
    nv = np.asarray(g.node_valid[:n])
    t = np.asarray(lie.pose_t(g.pose[:n]))
    ef = np.asarray(g.e_from[:e])
    et_ = np.asarray(g.e_to[:e])
    ev = np.asarray(g.e_valid[:e])
    ety = np.asarray(g.e_type[:e])

    seen = set()
    for i in range(e):
        if not (nv[ef[i]] and nv[et_[i]]):
            continue
        color, label = EDGE_COLORS.get(int(ety[i]), ("#bbbbbb", "other"))
        if not ev[i]:
            color, label = "#ee6677", "invalid"
        lbl = label if label not in seen else None
        seen.add(label)
        ax.plot(
            [t[ef[i], 0], t[et_[i], 0]], [t[ef[i], 1], t[et_[i], 1]],
            color=color, linewidth=0.8 if ev[i] else 0.4,
            alpha=0.9 if ev[i] else 0.4, label=lbl, zorder=2,
        )

    ax.scatter(t[nv, 0], t[nv, 1], s=12, c="#222222", zorder=3, label="nodes")
    fixed = nv & np.asarray(g.node_fixed[:n])
    if fixed.any():
        ax.scatter(t[fixed, 0], t[fixed, 1], s=40, marker="s",
                   facecolors="none", edgecolors="#aa3377", zorder=4, label="fixed")
    if gt_poses is not None:
        gt = np.asarray(gt_poses)
        ax.plot(gt[:, 0], gt[:, 1], "--", color="#999933", linewidth=1.2,
                label="ground truth", zorder=1)

    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
