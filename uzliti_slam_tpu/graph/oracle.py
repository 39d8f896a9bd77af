"""Sparse-Cholesky Gauss-Newton oracle — the g2o-equivalent reference.

The reference solves the pose graph with g2o's BlockSolver<6,3> + CSparse
Cholesky (``graph_optimization/src/g2o_optimizer.cpp:36-39``). This module
reproduces that solve on the host (scipy sparse Cholesky/LU over the
robustified normal equations, same factors/Huber weights as the TPU
solver) so the TPU PCG-LM result can be validated against "what g2o would
have returned" on any replayed graph — the parity bar for tests and the
``ate_tum_vs_oracle`` bench rung.
"""

from __future__ import annotations

import jax
import numpy as np

from uzliti_slam_tpu.graph import factors, solver
from uzliti_slam_tpu.ops import lie


def sparse_gn_oracle(g, iters: int = 12, lm: bool = False,
                     lambda_init: float = 1e-4):
    """Sparse Gauss-Newton (``lm=False``) or Levenberg-Marquardt
    (``lm=True``, the exact g2o configuration: λ·diag(H) damping with
    accept/reject) on the robustified normal equations; returns the solved
    poses (N, 7). Feasible at 10k+ nodes where a dense oracle is not.
    Plain GN suffices on small graphs; at 100k-node scale undamped GN can
    diverge — use ``lm=True`` there, as g2o itself would."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    labels = solver.connected_components(g)
    gauge = np.asarray(solver.gauge_fix_mask(g, labels))
    n = g.node_capacity
    free = np.repeat(np.asarray(g.node_valid) & ~gauge, 6)
    poses = g.pose

    res_jac = jax.jit(
        lambda p: factors.batched_residual_jacobians(
            p[g.e_from], p[g.e_to], g.e_transform
        )
    )
    winfo = jax.jit(
        lambda p, r: solver._weighted_info(g._replace(pose=p), r, 1.0)
    )
    ef = np.asarray(g.e_from)
    et = np.asarray(g.e_to)
    lam = lambda_init
    chi2_cur = float(solver.total_chi2(g, poses, 1.0)) if lm else None

    for _ in range(iters):
        r, Ji, Jj = res_jac(poses)
        W = np.asarray(winfo(poses, r))
        r, Ji, Jj = np.asarray(r), np.asarray(Ji), np.asarray(Jj)
        JiT = Ji.transpose(0, 2, 1)
        JjT = Jj.transpose(0, 2, 1)
        Hii = JiT @ W @ Ji
        Hij = JiT @ W @ Jj
        Hji = Hij.transpose(0, 2, 1)
        Hjj = JjT @ W @ Jj
        bi = (JiT @ (W @ r[..., None]))[..., 0]
        bj = (JjT @ (W @ r[..., None]))[..., 0]

        def block_coo(rows6, cols6, blocks):
            rr = (6 * rows6[:, None, None] + np.arange(6)[None, :, None])
            cc = (6 * cols6[:, None, None] + np.arange(6)[None, None, :])
            return (
                np.broadcast_to(rr, blocks.shape).ravel(),
                np.broadcast_to(cc, blocks.shape).ravel(),
                blocks.ravel(),
            )

        parts = [
            block_coo(ef, ef, Hii),
            block_coo(ef, et, Hij),
            block_coo(et, ef, Hji),
            block_coo(et, et, Hjj),
        ]
        rows = np.concatenate([p[0] for p in parts])
        cols = np.concatenate([p[1] for p in parts])
        vals = np.concatenate([p[2] for p in parts])
        H = sp.coo_matrix((vals, (rows, cols)), shape=(6 * n, 6 * n)).tocsr()
        b = np.zeros(6 * n)
        np.add.at(b, (6 * ef[:, None] + np.arange(6)[None]).ravel(), bi.ravel())
        np.add.at(b, (6 * et[:, None] + np.arange(6)[None]).ravel(), bj.ravel())

        Hf = H[free][:, free] + 1e-8 * sp.eye(int(free.sum()), format="csr")
        dx = np.zeros(6 * n)
        if lm:
            diag = sp.diags(np.maximum(Hf.diagonal(), 1e-6))
            dx[free] = spla.spsolve((Hf + lam * diag).tocsc(), -b[free])
            cand = lie.pose_retract(poses, jnp.asarray(dx.reshape(-1, 6)))
            chi2_new = float(solver.total_chi2(g, cand, 1.0))
            if chi2_new < chi2_cur:
                poses, chi2_cur = cand, chi2_new
                lam = max(lam / 3.0, 1e-9)
            else:
                lam = min(lam * 3.0, 1e2)
        else:
            dx[free] = spla.spsolve(Hf.tocsc(), -b[free])
            poses = lie.pose_retract(poses, jnp.asarray(dx.reshape(-1, 6)))
    return poses
