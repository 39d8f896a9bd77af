"""Robust SE(3) Gauss-Newton / Levenberg-Marquardt pose-graph solver.

TPU-native replacement for the reference's g2o wrapper
(``graph_optimization/src/g2o_optimizer.cpp``: BlockSolver<6,3> + CSparse
Cholesky + LM, 20 iterations).  Sparse Cholesky has no TPU idiom, so the
linear solve is a matrix-free **preconditioned conjugate gradient** on the
block-sparse Gauss-Newton Hessian: per-edge 6x6 Jacobian blocks are built
once per LM iteration with vmap, Hessian-vector products are
gather→einsum→segment-sum (pure XLA, fuses onto the VPU/MXU), and the
preconditioner is block-Jacobi (batched 6x6 Cholesky inverses).

Gauge fixing follows the reference policy (``g2o_optimizer.cpp:301-349``):
the oldest node of every connected component is held fixed — computed here
on-device by min-label propagation with pointer jumping instead of
HyperDijkstra on the host.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST

from uzliti_slam_tpu.graph import factors
from uzliti_slam_tpu.graph.state import EDGE_TYPE_2D_WHEEL_ODOMETRY, GraphState
from uzliti_slam_tpu.ops import lie


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    iterations: int = 20          # LM iterations (reference slam.yaml:51)
    pcg_iterations: int = 12      # CG steps per linear solve (the chain
                                  # preconditioner converges in far fewer
                                  # steps than block-Jacobi's O(N) diffusion)
    lambda_init: float = 1e-4
    lambda_factor: float = 3.0    # up/down scaling on reject/accept
    lambda_min: float = 1e-9
    lambda_max: float = 1e2
    huber_delta: float = 1.0      # g2o_optimizer.cpp:292-294
    pcg_tol: float = 1e-8         # relative residual early-stop (masked)
    optimize_xy_only: bool = False  # flatten to the x/y/yaw subspace — the
                                  # reference's planar mode (g2o_optimizer
                                  # .cpp:164-170 zeroes z/roll/pitch)
    preconditioner: str = "chain"  # "chain" (block-tridiagonal cyclic
                                  # reduction over the odometry spine —
                                  # default: strictly stronger than jacobi,
                                  # since U degrades to 0 without a spine)
                                  # | "woodbury" (chain + low-rank closure
                                  # correction — faster wall-clock, weaker
                                  # chi2 at equal budgets; see bench notes)
                                  # | "jacobi" (DIAGNOSTIC-ONLY: needs
                                  # O(N) CG steps to move information
                                  # along the chain, so it under-converges
                                  # at any practical budget; no product
                                  # path selects it)
    precond_refresh: int = 5      # LM iterations between chain re-factors.
                                  # A stale (previous-linearization) factor
                                  # is still SPD, so PCG stays correct — it
                                  # only costs a little CG convergence. The
                                  # factor dominates the LM iteration at
                                  # >=10k nodes, so refactoring every 5th
                                  # iteration is a large win there. Pick a
                                  # divisor of `iterations` (trailing
                                  # partial chunks run masked no-op steps).
    chain_dense_cutoff: int = 64  # cyclic reduction stops at this many
                                  # surviving blocks and inverts the root
                                  # densely (fewer latency-bound levels —
                                  # right for ONE large graph). Batched
                                  # fleets pair a small cutoff with
                                  # chain_root_ns=True.
    chain_root_ns: bool = False   # invert the dense root by Newton-
                                  # Schulz (batched matmuls) instead of
                                  # LU. The FLEET setting: vmapped LU
                                  # serializes per instance on TPU, while
                                  # NS matmuls batch across the fleet —
                                  # cutting cyclic reduction to ~2 levels
                                  # (cutoff 16) without LU's latency.
                                  # Approximate (preconditioner-grade).
    use_odometry_calibration: bool = False  # remap odometry-edge
                                  # measurements through the calibrated
                                  # drift model (``graph.odom_params``)
                                  # before solving — the reference does
                                  # this inside its optimizer
                                  # (``g2o_optimizer.cpp:209-227``).
                                  # Stored measurements stay RAW; only the
                                  # solve (and the written-back edge
                                  # errors) see the corrected values.
    restart_chi2_margin: float = 0.2  # odometry_restart trigger: the
                                  # second (odometry-start) solve runs
                                  # unless the refined-start solve ended
                                  # below margin * chi2(odometry prior).
                                  # 0 = always restart, inf = never.
    odometry_restart: bool = False  # ALSO solve from the odometry-prior
                                  # trajectory (diff ∘ odom_pose per node)
                                  # and keep the lower-chi2 result. Pose
                                  # graphs are multi-modal: once a mid-run
                                  # solve lands in a poor basin, later
                                  # solves started from it stay stuck (LM
                                  # rejects every step) even when the
                                  # odometry manifold leads to a better
                                  # minimum. The second start runs under a
                                  # lax.cond gated by restart_chi2_margin,
                                  # so a well-converged epoch pays ~1x.
                                  # Off by default; the live pipeline
                                  # enables it.
    split_hv_threshold: int = 4096  # node capacity at which the dense/
                                  # sparse split Hv replaces the full-
                                  # scatter form. Below ~4k nodes the solve
                                  # is op-latency-bound and the split only
                                  # adds kernels; tests lower this to force
                                  # the split path on small graphs.
    early_exit: bool = True       # terminate LM once an accepted step's
                                  # relative chi2 gain drops below
                                  # ``early_exit_tol`` or LM is stuck at
                                  # lambda_max — the same semantics as
                                  # g2o's optimize(N) (N is an upper
                                  # bound; its terminateThreshold stops
                                  # on small gain).  Runs the LM loop as
                                  # a lax.while_loop (single-device chain
                                  # path only); set False for fixed-
                                  # iteration-count benchmarking.
    early_exit_tol: float = 1e-6  # relative chi2 gain below which an
                                  # accepted step counts as converged.
    unroll_lm: int = 1            # lax.scan unroll factor for the LM loop;
                                  # small-graph solves are op-latency-bound
                                  # (hundreds of ~µs-scale ops per solve),
                                  # and unrolling lets XLA fuse/overlap
                                  # across iterations and drop While-loop
                                  # bookkeeping. Costs compile time.
    unroll_pcg: int = 1           # same for the inner CG fori_loop.
    dense_gathers: bool = False   # replace EVERY edge gather / segment-
                                  # sum with one-hot matmuls (E,N one-hot
                                  # selection matrices, built once per
                                  # solve from the static topology). TPU
                                  # row gathers/scatters cost ~a tile
                                  # access per index, which dominates a
                                  # vmapped FLEET of tiny solves (4096 x
                                  # 256-edge tables = 1M indexed rows per
                                  # op); the one-hot matmul form trades
                                  # that for MXU-batched flops. Memory is
                                  # O(E*N) per instance — use for small
                                  # graphs (<=128 nodes); exact at
                                  # HIGHEST matmul precision.
    woodbury_ns_iters: int = 20   # Newton-Schulz iterations for the
                                  # explicit K×K inverse inside the
                                  # "woodbury" preconditioner (pure
                                  # matmuls; quadratic convergence, so
                                  # ~20 handles condition numbers to
                                  # ~1e6 — and preconditioning only
                                  # needs an approximate inverse).
    mode: str = "auto"            # "auto" | "direct" | "pcg". "direct"
                                  # solves (H + λ·diag) dx = -g EXACTLY
                                  # each LM iteration: the odometry-spine
                                  # block-tridiagonal factored by cyclic
                                  # reduction is the base solve, and the
                                  # compacted closure edges enter as a
                                  # low-rank B·Bᵀ correction via the
                                  # Woodbury identity — no PCG loop at
                                  # all.  Measured on TPU v5e, XLA's K×K
                                  # Cholesky/cho_solve lower to
                                  # sequential blocked loops (~3-6 ms per
                                  # call regardless of K), so the exact
                                  # path LOSES to chain-PCG there; it is
                                  # kept as an explicit option (exactness
                                  # oracle, CPU/LAPACK backends) and is
                                  # never chosen by "auto".
    direct_node_threshold: int = 4096
    direct_closure_cap: int = 512  # static closure capacity of the direct
                                  # path (K = 6·cap columns). Overflow
                                  # falls back to chain-preconditioned
                                  # PCG inside the same jit (lax.cond) —
                                  # slower, never wrong.
    direct_inner_cg: int = 0      # 0: solve the K×K Woodbury system with
                                  # Cholesky (exact; right on CPU/LAPACK).
                                  # >0: that many Jacobi-preconditioned CG
                                  # iterations on the SPD K×K system —
                                  # each inner iteration is ONE dense
                                  # matvec (a single fused op), which is
                                  # what TPU wants; XLA's Cholesky there
                                  # is a ~3-6 ms sequential loop.
    closure_fraction: float = 0.25  # static capacity of the compacted
                                  # closure-edge table, as a fraction of
                                  # edge capacity. TPU row gathers/scatters
                                  # cost ~tile-per-index, so the CG loop
                                  # splits H into a dense node-indexed part
                                  # (diagonal blocks + odometry-spine
                                  # couplings = shift ops, zero gathers)
                                  # plus scatter work ONLY for compacted
                                  # loop-closure edges. If closures exceed
                                  # the cap the solve falls back to the
                                  # full-scatter Hv (lax.cond) — slower,
                                  # never wrong.


class SolveStats(NamedTuple):
    chi2_history: jax.Array   # (iterations + 1,)
    accepted: jax.Array       # (iterations,) bool
    final_lambda: jax.Array   # ()
    num_gauge_fixed: jax.Array  # () int32


# ---------------------------------------------------------------------------
# Connected components + gauge fixing (on-device)
# ---------------------------------------------------------------------------

def connected_components(g: GraphState, num_iters: int | None = None) -> jax.Array:
    """Min-label propagation over valid edges with pointer jumping.

    Returns (N,) int32 component labels (the min node slot in each
    component). Invalid nodes keep their own index.
    """
    n = g.node_capacity
    labels0 = jnp.arange(n, dtype=jnp.int32)
    ew = g.e_valid
    ef, et = g.e_from, g.e_to
    # Pointer jumping halves path length each sweep; edge relaxation merges
    # neighbours — ~log2(n) sweeps suffice.
    iters = num_iters if num_iters is not None else max(2 * math.ceil(math.log2(max(n, 2))), 8)

    def body(_, labels):
        lf = labels[ef]
        lt = labels[et]
        m = jnp.minimum(lf, lt)
        big = jnp.iinfo(jnp.int32).max
        upd_f = jnp.where(ew, m, big)
        upd_t = jnp.where(ew, m, big)
        labels = labels.at[ef].min(upd_f)
        labels = labels.at[et].min(upd_t)
        # pointer jump (twice)
        labels = labels[labels]
        return labels[labels]

    return jax.lax.fori_loop(0, iters, body, labels0)


def gauge_fix_mask(g: GraphState, labels: jax.Array) -> jax.Array:
    """Nodes to hold fixed during the solve.

    Pre-fixed nodes (scope-boundary anchors, reference
    ``scopeRequestCallback`` marking in-radius nodes fixed) are honored; any
    component without one gets its oldest valid node fixed (reference
    ``setFixedNodes``, ``g2o_optimizer.cpp:301-349``).
    """
    n = g.node_capacity
    has_fixed = jax.ops.segment_max(
        jnp.where(g.node_valid & g.node_fixed, 1, 0), labels, num_segments=n
    )
    inf = jnp.float32(jnp.inf)
    stamp_key = jnp.where(g.node_valid, g.stamp, inf)
    min_stamp = jax.ops.segment_min(stamp_key, labels, num_segments=n)
    is_oldest_cand = g.node_valid & (stamp_key == min_stamp[labels])
    # tie-break: smallest slot among candidates
    idx_key = jnp.where(is_oldest_cand, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    min_idx = jax.ops.segment_min(idx_key, labels, num_segments=n)
    is_oldest = is_oldest_cand & (jnp.arange(n, dtype=jnp.int32) == min_idx[labels])
    return (g.node_valid & g.node_fixed) | (is_oldest & (has_fixed[labels] == 0))


# ---------------------------------------------------------------------------
# Normal equations as matrix-free operators
# ---------------------------------------------------------------------------

def _weighted_info(g: GraphState, r: jax.Array, huber_delta: float) -> jax.Array:
    """Per-edge robustly-weighted information, zeroed for invalid edges."""
    chi2 = factors.edge_chi2(r, g.e_info)
    w = factors.huber_weight(chi2, huber_delta) * g.e_valid
    return g.e_info * w[:, None, None]


def _identity_reduce(x):
    return x


def _gradient(g: GraphState, r, Ji, Jj, W, free, reduce=_identity_reduce) -> jax.Array:
    """g_vec = Σ J^T W r scattered to nodes; (N, 6).

    ``reduce`` sums partial node-indexed accumulations across an edge-sharded
    device axis (psum over ICI in the sharded solver); identity on one chip.
    """
    n = g.node_capacity
    Wr = jnp.einsum("eij,ej->ei", W, r, precision=_PREC)
    gi = jnp.einsum("eji,ej->ei", Ji, Wr, precision=_PREC)
    gj = jnp.einsum("eji,ej->ei", Jj, Wr, precision=_PREC)
    out = jax.ops.segment_sum(gi, g.e_from, num_segments=n)
    out = out + jax.ops.segment_sum(gj, g.e_to, num_segments=n)
    return reduce(out) * free[:, None]


def _hessian_diag_blocks(g: GraphState, Ji, Jj, W, reduce=_identity_reduce) -> jax.Array:
    """Block-diagonal of H: (N, 6, 6) via segment-sum of JᵀWJ."""
    n = g.node_capacity
    WJi = jnp.einsum("eij,ejk->eik", W, Ji, precision=_PREC)
    WJj = jnp.einsum("eij,ejk->eik", W, Jj, precision=_PREC)
    Hii = jnp.einsum("eji,ejk->eik", Ji, WJi, precision=_PREC)
    Hjj = jnp.einsum("eji,ejk->eik", Jj, WJj, precision=_PREC)
    out = jax.ops.segment_sum(Hii, g.e_from, num_segments=n)
    return reduce(out + jax.ops.segment_sum(Hjj, g.e_to, num_segments=n))


def _make_hvp(g: GraphState, Ji, Jj, W, damp: jax.Array, free: jax.Array,
              reduce=_identity_reduce, edge_ops=None):
    """Matrix-free (H + λ·diag) @ v, rows/cols masked to free nodes."""
    if edge_ops is None:
        edge_ops = _make_edge_ops(g, False)
    gath_from, gath_to, scat_from, scat_to = edge_ops

    def hvp(v):
        vm = v * free[:, None]
        u = jnp.einsum("eij,ej->ei", Ji, gath_from(vm), precision=_PREC) + jnp.einsum("eij,ej->ei", Jj, gath_to(vm), precision=_PREC)
        Wu = jnp.einsum("eij,ej->ei", W, u, precision=_PREC)
        yi = jnp.einsum("eji,ej->ei", Ji, Wu, precision=_PREC)
        yj = jnp.einsum("eji,ej->ei", Jj, Wu, precision=_PREC)
        y = reduce(scat_from(yi) + scat_to(yj))
        return (y + damp * vm) * free[:, None]

    return hvp


def _make_edge_ops(g: GraphState, dense: bool):
    """Gather/scatter primitives over the edge table.

    ``dense=False``: indexed gathers + ``segment_sum`` (the right form for
    ONE large graph).  ``dense=True``: one-hot (E, N) selection matrices
    built once from the static topology; every gather/scatter becomes an
    MXU matmul — the FLEET form, where a vmapped batch of tiny tables
    makes per-index tile accesses the dominant cost (see
    ``SolverConfig.dense_gathers``).  One-hot selection is exact; matmuls
    run at HIGHEST precision so gathered VALUES keep f32 accuracy.
    """
    n = g.node_capacity
    if not dense:
        return (
            lambda x: x[g.e_from],
            lambda x: x[g.e_to],
            lambda p: jax.ops.segment_sum(p, g.e_from, num_segments=n),
            lambda p: jax.ops.segment_sum(p, g.e_to, num_segments=n),
        )
    ids = jnp.arange(n, dtype=g.e_from.dtype)
    Sf = (g.e_from[:, None] == ids[None, :]).astype(g.pose.dtype)
    St = (g.e_to[:, None] == ids[None, :]).astype(g.pose.dtype)
    return (
        lambda x: jnp.einsum("en,np->ep", Sf, x, precision=_PREC),
        lambda x: jnp.einsum("en,np->ep", St, x, precision=_PREC),
        lambda p: jnp.einsum("en,ep->np", Sf, p, precision=_PREC),
        lambda p: jnp.einsum("en,ep->np", St, p, precision=_PREC),
    )


def _make_fused_linearize(g: GraphState, free: jax.Array, config: SolverConfig,
                          adj_meas_inv: jax.Array, edge_ops=None):
    """Factory for the fused linearization used by the fast/direct paths.

    Returns ``linearize(r) -> (Ji, Jj, W, grad, Hblocks, U)`` computing the
    gradient, block-diagonal Hessian and spine off-diagonal blocks with ONE
    segment-sum per edge endpoint: per-edge payloads are concatenated into
    (E, 78)/(E, 42) rows — scatters are the most latency-expensive ops in
    an LM iteration on TPU, so five of them collapse into two.
    """
    n = g.node_capacity
    dt = g.pose.dtype
    is_chain_w = ((g.e_to == g.e_from + 1) & g.e_valid).astype(dt)
    both_free = (free[:, None, None] > 0) & (jnp.roll(free, -1)[:, None, None] > 0)
    cmask = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0], dt)
    if edge_ops is None:
        edge_ops = _make_edge_ops(g, False)
    _, _, scat_from, scat_to = edge_ops

    def linearize(r):
        W = _weighted_info(g, r, config.huber_delta)
        Ji, Jj = factors.jacobians_from_residual(r, adj_meas_inv)
        if config.optimize_xy_only:
            # project onto x/y/yaw by column-masking the Jacobians: every
            # assembled quantity below then lives in P·H·P automatically
            Ji = Ji * cmask
            Jj = Jj * cmask
        Wr = jnp.einsum("eij,ej->ei", W, r, precision=_PREC)
        gi = jnp.einsum("eji,ej->ei", Ji, Wr, precision=_PREC)
        gj = jnp.einsum("eji,ej->ei", Jj, Wr, precision=_PREC)
        WJi = jnp.einsum("eij,ejk->eik", W, Ji, precision=_PREC)
        WJj = jnp.einsum("eij,ejk->eik", W, Jj, precision=_PREC)
        Hii = jnp.einsum("eji,ejk->eik", Ji, WJi, precision=_PREC)
        Hjj = jnp.einsum("eji,ejk->eik", Jj, WJj, precision=_PREC)
        Uc = jnp.einsum("eji,ejk->eik", Ji, WJj, precision=_PREC)
        Uc = Uc * is_chain_w[:, None, None]
        E = g.edge_capacity
        pf = jnp.concatenate(
            [gi, Hii.reshape(E, 36), Uc.reshape(E, 36)], axis=1
        )
        pt = jnp.concatenate([gj, Hjj.reshape(E, 36)], axis=1)
        sf = scat_from(pf)
        st = scat_to(pt)
        grad = (sf[:, :6] + st[:, :6]) * free[:, None]
        Hb = (sf[:, 6:42] + st[:, 6:42]).reshape(n, 6, 6)
        U = sf[:, 42:].reshape(n, 6, 6) * both_free
        return Ji, Jj, W, grad, Hb, U

    return linearize


def closure_partition(g: GraphState, capacity: int):
    """Compacted table of non-spine (loop-closure) edge slots.

    Topology-only (valid masks + indices, no poses), so it is computed ONCE
    per solve.  Returns (cl_idx (C,), cl_from (C,), cl_to (C,), n_closure)
    where padding rows point at node slot ``n`` (gathers read a zero row,
    scatters drop).  Spine edges — ``e_to == e_from + 1`` — are exactly the
    set the chain preconditioner's off-diagonal assembles densely.
    """
    n = g.node_capacity
    is_chain = (g.e_to == g.e_from + 1) & g.e_valid
    is_cl = g.e_valid & ~is_chain
    n_cl = jnp.sum(is_cl).astype(jnp.int32)
    order = jnp.argsort(~is_cl, stable=True)  # closures first
    cl_idx = order[:capacity]
    in_range = jnp.arange(capacity, dtype=jnp.int32) < n_cl
    cl_from = jnp.where(in_range, g.e_from[cl_idx], n)
    cl_to = jnp.where(in_range, g.e_to[cl_idx], n)
    return cl_idx, cl_from, cl_to, n_cl


def _make_split_hvp(g: GraphState, Ji, Jj, W, Hblocks, U, closure,
                    damp: jax.Array, free: jax.Array):
    """(H + λ·diag) @ v with the TPU-friendly dense/sparse split.

    H·v = diag-blocks·v  (node-indexed einsum, no gather)
        + spine couplings U (consecutive slots → shift ops, no gather)
        + closure couplings (gather/scatter over the SMALL compacted
          closure table instead of the whole edge table).

    Row gathers/scatters on TPU cost roughly a (8,128) tile access per
    index, so moving the odometry spine (the bulk of a SLAM edge table)
    out of the scatter path is worth ~4-5x per CG iteration at 100k
    nodes.  Falls back to the full-scatter form when closures overflow
    the static table (correctness is never capacity-dependent).
    """
    n = g.node_capacity
    cl_idx, cl_from, cl_to, n_cl = closure
    C = cl_idx.shape[0]
    # H[from, to] 6x6 coupling blocks for compacted closure edges — one
    # C-sized gather per LM iteration instead of E-sized work per CG step.
    Bij = jnp.einsum(
        "eji,ejk,ekl->eil", Ji[cl_idx], W[cl_idx], Jj[cl_idx], precision=_PREC
    )
    zrow = jnp.zeros((1, 6), Hblocks.dtype)
    fallback = _make_hvp(g, Ji, Jj, W, damp, free)
    fits = n_cl <= C

    def fast(v):
        vm = v * free[:, None]
        y = jnp.einsum("nij,nj->ni", Hblocks, vm, precision=_PREC)
        vnext = jnp.concatenate([vm[1:], zrow])
        y = y + jnp.einsum("nij,nj->ni", U, vnext, precision=_PREC)
        up = jnp.einsum("nji,nj->ni", U, vm, precision=_PREC)  # → slot i+1
        y = y + jnp.concatenate([zrow, up[:-1]])
        vm_ext = jnp.concatenate([vm, zrow])
        uf = jnp.einsum("cij,cj->ci", Bij, vm_ext[cl_to], precision=_PREC)
        ut = jnp.einsum("cji,cj->ci", Bij, vm_ext[cl_from], precision=_PREC)
        y = y + jax.ops.segment_sum(uf, cl_from, num_segments=n + 1)[:n]
        y = y + jax.ops.segment_sum(ut, cl_to, num_segments=n + 1)[:n]
        return (y + damp * vm) * free[:, None]

    return lambda v: jax.lax.cond(fits, fast, fallback, v)


def _block_jacobi_inverse(Hblocks: jax.Array, damp: jax.Array, free: jax.Array) -> jax.Array:
    """Inverse of (H_block + λ diag) per node; identity for non-free nodes."""
    eye = jnp.eye(6)
    damped = Hblocks + jax.vmap(jnp.diag)(damp) + 1e-8 * eye
    safe = jnp.where(free[:, None, None], damped, eye)
    # Cholesky-based inverse of SPD 6x6 blocks (batched).
    chol = jax.vmap(jnp.linalg.cholesky)(safe)
    inv = jax.vmap(lambda c: jax.scipy.linalg.cho_solve((c, True), eye))(chol)
    # Per-BLOCK fallback: a partially non-finite inverse (failed pivot)
    # must degrade to identity wholesale — element-wise patching would
    # yield an asymmetric, possibly indefinite preconditioner block.
    block_ok = jnp.all(jnp.isfinite(inv), axis=(-2, -1), keepdims=True)
    inv = jnp.where(block_ok, inv, eye)
    return jnp.where(free[:, None, None], inv, eye)


def _newton_schulz_inverse(A: jax.Array, iters: int) -> jax.Array:
    """Approximate inverse of an SPD matrix by Newton-Schulz iteration.

    X ← X(2I − AX), initialized at Aᵀ/(‖A‖₁‖A‖∞) (guaranteed convergent).
    Pure dense matmuls — the TPU-shaped replacement for the K×K Cholesky
    (XLA lowers Cholesky/LU to multi-ms sequential blocked loops on TPU,
    while ~2·iters matmuls of a few hundred square run in ~100 µs).
    Falls back to the diagonal inverse if the iteration diverges
    (preconditioner-grade accuracy is all the caller needs).
    """
    k = A.shape[0]
    a1 = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    ainf = jnp.max(jnp.sum(jnp.abs(A), axis=1))
    X = A.T / jnp.maximum(a1 * ainf, 1e-12)
    eye = jnp.eye(k, dtype=A.dtype)

    def body(X, _):
        return X @ (2.0 * eye - A @ X), None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    ok = jnp.all(jnp.isfinite(X))
    dinv = jnp.diag(1.0 / jnp.maximum(jnp.diagonal(A), 1e-12))
    return jnp.where(ok, X, dinv)


def _pcg(hvp, apply_minv, b, iterations: int, tol: float, unroll: int = 1):
    """Preconditioned CG for H dx = b. Fixed iteration count, masked stall."""

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_minv(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    b2 = jnp.vdot(b, b)

    def body(carry, _):
        x, r, p, rz = carry
        Hp = hvp(p)
        pHp = jnp.vdot(p, Hp)
        ok = (pHp > 1e-20) & (rz > tol * (b2 + 1e-30))
        alpha = jnp.where(ok, rz / jnp.where(pHp == 0, 1.0, pHp), 0.0)
        x = x + alpha * p
        r = r - alpha * Hp
        z = apply_minv(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(ok, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = jnp.where(ok, z + beta * p, p)
        return (x, r, p, jnp.where(ok, rz_new, rz)), None

    (x, r, _, _), _ = jax.lax.scan(
        body, (x0, r0, p0, rz0), None, length=iterations,
        unroll=min(unroll, max(iterations, 1)),
    )
    return x


# ---------------------------------------------------------------------------
# Direct LM: exact (H + λ·diag) solve via chain factor + Woodbury closure
# correction
# ---------------------------------------------------------------------------

def _lm_loop_direct(g: GraphState, free: jax.Array, config: SolverConfig,
                    r0: jax.Array, chi2_0: jax.Array, adj_meas_inv: jax.Array):
    """LM with an EXACT linear solve per iteration — no outer PCG loop.

    Split H + λ·diag = T + B·Bᵀ where
      T = odometry-spine block-tridiagonal (consecutive-slot couplings,
          their diagonal contributions, Marquardt damping over the FULL
          diagonal) — factored by cyclic reduction once per iteration;
      B = per-closure-edge factors stacked column-blockwise: each closure
          edge contributes J_eᵀ W_e J_e = V_e·V_eᵀ with V_e = J_eᵀ·chol(W_e).
    Woodbury: H⁻¹b = T⁻¹b - Z·(I + BᵀZ)⁻¹·BᵀT⁻¹b with Z = T⁻¹B, so the
    whole linear solve is ONE K-wide multi-RHS substitution sweep plus one
    K×K SPD solve (K = 6·closure-capacity).  The K-system is solved by
    Cholesky (CPU/LAPACK) or ``direct_inner_cg`` Jacobi-CG matvec
    iterations (TPU — XLA's Cholesky there is a multi-ms sequential
    loop).  B is assembled by one-hot outer products, NOT scatter — the
    (n,6,C,6) scatter-add measured ~760 µs/iteration on TPU v5e while the
    outer-product build is memory-bound (~150 µs).

    Exact steps make LM converge in ~half the iteration budget of the
    under-solving PCG path, so the same g2o-parity early termination as
    ``_lm_loop_fast`` applies.  Replaces the reference's CSparse Cholesky
    inside its LM loop (``g2o_optimizer.cpp:137-149``).  Closure overflow
    of the static cap falls back to chain-preconditioned PCG under
    ``lax.cond`` (slower, never wrong).
    """
    from uzliti_slam_tpu.graph import tridiag

    n = g.node_capacity
    dt = g.pose.dtype
    C = min(
        max(int(config.closure_fraction * g.edge_capacity), 8),
        config.direct_closure_cap,
        g.edge_capacity,
    )
    cl_idx, cl_from, cl_to, n_cl = closure_partition(g, C)
    K = 6 * C
    fits = n_cl <= C
    free_ext = jnp.concatenate([free, jnp.zeros((1,), free.dtype)])
    eye6 = jnp.eye(6, dtype=dt)
    cmask = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0], dt)
    linearize = _make_fused_linearize(g, free, config, adj_meas_inv)
    # one-hot row-selection matrices for the closure endpoints: B and all
    # Bᵀ· products become dense matmuls instead of scatters/gathers
    node_ids = jnp.arange(n, dtype=jnp.int32)
    Sf = (cl_from[:, None] == node_ids[None, :]).astype(dt)   # (C, n)
    St = (cl_to[:, None] == node_ids[None, :]).astype(dt)

    def lm_step(carry):
        it, poses, r, lam, chi2_cur, hist, acc, done = carry
        Ji, Jj, W, grad, Hfull, U = linearize(r)
        # per-closure factors V = Jᵀ·chol(W + δI); δ keeps the Cholesky
        # finite for partial-constraint edge types with zero info blocks
        # while perturbing H by ~1e-8
        Wc = W[cl_idx] + 1e-8 * eye6
        Lc = jnp.linalg.cholesky(Wc)
        Lc = jnp.where(jnp.isfinite(Lc), Lc, 0.0)
        Vf = jnp.einsum("cji,cjk->cik", Ji[cl_idx], Lc, precision=_PREC)
        Vt = jnp.einsum("cji,cjk->cik", Jj[cl_idx], Lc, precision=_PREC)
        Vf = Vf * free_ext[cl_from][:, None, None]
        Vt = Vt * free_ext[cl_to][:, None, None]
        # spine-only diagonal = full diagonal minus closure contributions
        Hcl_f = jnp.einsum("cik,cjk->cij", Vf, Vf, precision=_PREC)
        Hcl_t = jnp.einsum("cik,cjk->cij", Vt, Vt, precision=_PREC)
        Hcl = jnp.einsum("cn,cij->nij", Sf, Hcl_f, precision=_PREC) + \
              jnp.einsum("cn,cij->nij", St, Hcl_t, precision=_PREC)
        Hsp = Hfull - Hcl
        hdiag = jax.vmap(jnp.diag)(Hfull)
        damp = lam * jnp.maximum(hdiag, 1e-6)
        # 1e-4 floor keeps T invertible for nodes with no spine edges
        # (closure-only / isolated) — an O(1e-4) extra damping vs info
        # scales of O(100), absorbed into LM's λ semantics
        Dm = Hsp + jax.vmap(jnp.diag)(damp) + 1e-4 * eye6
        if config.optimize_xy_only:
            Dm = Dm + jnp.diag(1.0 - cmask)
        Dm = jnp.where(free[:, None, None] > 0, Dm, eye6)
        factor = tridiag.block_tridiag_factor(
            Dm, U, dense_cutoff=config.chain_dense_cutoff,
            root_ns=config.chain_root_ns,
        )
        # B via one-hot outer products: B[m, i, c, k] = Sf[c,m]·Vf[c,i,k] + ...
        B = jnp.einsum("cn,cik->nick", Sf, Vf, precision=_PREC) + \
            jnp.einsum("cn,cik->nick", St, Vt, precision=_PREC)
        B = B.reshape(n, 6, K)
        rhs = jnp.concatenate([B, -grad[:, :, None]], axis=2)
        Zall = tridiag.block_tridiag_apply(factor, rhs)
        Z, y = Zall[:, :, :K], Zall[:, :, K]
        # Bᵀ·Z and Bᵀ·y through the one-hot row selections (pure matmuls)
        Zf = jnp.einsum("cn,nik->cik", Sf, Z, precision=_PREC)
        Zt = jnp.einsum("cn,nik->cik", St, Z, precision=_PREC)
        BtZ = (
            jnp.einsum("cji,cjk->cik", Vf, Zf, precision=_PREC)
            + jnp.einsum("cji,cjk->cik", Vt, Zt, precision=_PREC)
        ).reshape(K, K)
        Kmat = jnp.eye(K, dtype=BtZ.dtype) + BtZ
        yf = jnp.einsum("cn,ni->ci", Sf, y, precision=_PREC)
        yt = jnp.einsum("cn,ni->ci", St, y, precision=_PREC)
        u = (
            jnp.einsum("cji,cj->ci", Vf, yf, precision=_PREC)
            + jnp.einsum("cji,cj->ci", Vt, yt, precision=_PREC)
        ).reshape(K)
        if config.direct_inner_cg > 0:
            ok = fits & jnp.all(jnp.isfinite(Kmat))

            def solve_K(_):
                dinv = 1.0 / jnp.maximum(jnp.diagonal(Kmat), 1e-12)
                x = jnp.zeros_like(u)
                rr = u
                z = dinv * rr
                p = z
                rz = jnp.vdot(rr, z)

                def cgb(carry2, _):
                    x, rr, p, rz = carry2
                    Ap = Kmat @ p
                    pAp = jnp.vdot(p, Ap)
                    okk = pAp > 1e-30
                    alpha = jnp.where(okk, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
                    x = x + alpha * p
                    rr = rr - alpha * Ap
                    z = dinv * rr
                    rz_new = jnp.vdot(rr, z)
                    beta = jnp.where(okk, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
                    p = jnp.where(okk, z + beta * p, p)
                    return (x, rr, p, jnp.where(okk, rz_new, rz)), None

                (x, _, _, _), _ = jax.lax.scan(
                    cgb, (x, rr, p, rz), None, length=config.direct_inner_cg
                )
                return x
        else:
            cholK = jnp.linalg.cholesky(Kmat)
            ok = fits & jnp.all(jnp.isfinite(jnp.diagonal(cholK)))

            def solve_K(_):
                return jax.scipy.linalg.cho_solve((cholK, True), u)

        def direct_dx(_):
            v = solve_K(None)
            return y - jnp.einsum("nik,k->ni", Z, v, precision=_PREC)

        def pcg_dx(_):
            hvp = _make_hvp(g, Ji, Jj, W, damp, free)
            minv = lambda rr: tridiag.block_tridiag_apply(factor, rr)
            return _pcg(hvp, minv, -grad, config.pcg_iterations,
                        config.pcg_tol, unroll=config.unroll_pcg)

        dx = jax.lax.cond(ok, direct_dx, pcg_dx, None)
        dx = dx * free[:, None]
        if config.optimize_xy_only:
            dx = dx * cmask

        cand = lie.pose_retract(poses, dx)
        r_cand = factors.batched_residuals(
            cand[g.e_from], cand[g.e_to], g.e_transform
        )
        chi2_new = _robust_chi2_from_r(g, r_cand, config.huber_delta)
        accept = chi2_new < chi2_cur
        gain = (chi2_cur - chi2_new) / jnp.maximum(chi2_cur, 1e-12)
        poses = jnp.where(accept, cand, poses)
        r = jnp.where(accept, r_cand, r)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        lam_next = jnp.clip(
            jnp.where(accept, lam / config.lambda_factor, lam * config.lambda_factor),
            config.lambda_min,
            config.lambda_max,
        )
        if config.early_exit:
            done = (
                accept
                & (gain < config.early_exit_tol)
                & (lam <= config.lambda_init)
            ) | ((~accept) & (lam >= config.lambda_max))
        else:
            done = jnp.asarray(False)
        hist = hist.at[it].set(chi2_cur)
        acc = acc.at[it].set(accept)
        return (it + 1, poses, r, lam_next, chi2_cur, hist, acc, done)

    def cond(carry):
        it, _, _, _, _, _, _, done = carry
        return (~done) & (it < config.iterations)

    hist0 = jnp.full((config.iterations,), chi2_0, dtype=dt)
    acc0 = jnp.zeros((config.iterations,), dtype=bool)
    init = (jnp.asarray(0, jnp.int32), g.pose, r0,
            jnp.asarray(config.lambda_init, dt), chi2_0, hist0, acc0,
            jnp.asarray(False))
    it, poses, _, lam, chi2_f, hist, acc, _ = jax.lax.while_loop(
        cond, lm_step, init
    )
    steps = jnp.arange(config.iterations)
    hist = jnp.where(steps < it, hist, chi2_f)
    return poses, lam, jnp.concatenate([chi2_0[None], hist]), acc


# ---------------------------------------------------------------------------
# Fast chain-PCG LM: fused scatters + g2o-style early termination
# ---------------------------------------------------------------------------

def _lm_loop_fast(g: GraphState, free: jax.Array, config: SolverConfig,
                  r0: jax.Array, chi2_0: jax.Array, adj_meas_inv: jax.Array):
    """Single-device chain-preconditioned LM tuned for op-latency-bound
    small/medium graphs (the live-pipeline regime).

    Differences vs the generic scan path:
    - ONE segment-sum per edge endpoint: the per-edge gradient, diagonal
      Hessian block, and spine off-diagonal payloads are concatenated into
      a single (E, 78)/(E, 42) scatter instead of five separate ones —
      scatters are the most latency-expensive ops in the iteration.
    - ``lax.while_loop`` with g2o-parity termination (relative chi2 gain
      below tol on an accepted step, or stuck at lambda_max): g2o's
      ``optimize(20)`` treats 20 as an upper bound and stops on small
      gain (terminateThreshold); a converged 1k-node solve typically
      needs ~half the budget.
    - the chain factor is refreshed under ``lax.cond`` every
      ``precond_refresh`` iterations, so the amortization works inside
      the while loop too.
    """
    from uzliti_slam_tpu.graph import tridiag

    n = g.node_capacity
    dt = g.pose.dtype
    eye6 = jnp.eye(6, dtype=dt)
    cmask = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0], dt)
    refresh = max(1, min(int(config.precond_refresh), config.iterations))
    use_split = g.node_capacity >= config.split_hv_threshold
    if use_split:
        ccap = max(int(config.closure_fraction * g.edge_capacity), 64)
        closure = closure_partition(g, min(ccap, g.edge_capacity))

    edge_ops = _make_edge_ops(g, config.dense_gathers and not use_split)
    gath_from, gath_to = edge_ops[0], edge_ops[1]
    linearize = _make_fused_linearize(g, free, config, adj_meas_inv, edge_ops)

    use_wb = config.preconditioner == "woodbury"
    if use_wb:
        C = min(
            max(int(config.closure_fraction * g.edge_capacity), 8),
            config.direct_closure_cap,
            g.edge_capacity,
        )
        cl_idx, cl_from, cl_to, _n_cl = closure_partition(g, C)
        K = 6 * C
        free_ext = jnp.concatenate([free, jnp.zeros((1,), free.dtype)])
        node_ids = jnp.arange(n, dtype=jnp.int32)
        # one-hot row selections: every Bᵀ· product becomes a dense
        # matmul (the (n,6,C,6) scatter-add measured ~760 µs on v5e)
        Sf = (cl_from[:, None] == node_ids[None, :]).astype(dt)
        St = (cl_to[:, None] == node_ids[None, :]).astype(dt)

        def build_pack(Ji, Jj, W, Hb, U, damp):
            """Woodbury pack: M⁻¹ = T⁻¹ − P·(BᵀT⁻¹·) with P = T⁻¹B·K⁻¹.

            T = spine tridiagonal + damping (cyclic-reduction factor),
            B = per-closure factors Jᵀ·chol(W), K = I + BᵀT⁻¹B inverted
            by Newton-Schulz.  At build time M⁻¹ IS (H+λ·diag)⁻¹ — an
            exact solve; between refreshes it stays a near-exact
            preconditioner, so 2-3 CG iterations recover direct-solve
            step quality at chain-apply cost.  Closure overflow of the
            static cap only WEAKENS the preconditioner (B truncated —
            still SPD), never breaks correctness.
            """
            Wc = W[cl_idx] + 1e-8 * eye6
            Lc = jnp.linalg.cholesky(Wc)
            Lc = jnp.where(jnp.isfinite(Lc), Lc, 0.0)
            Vf = jnp.einsum("cji,cjk->cik", Ji[cl_idx], Lc, precision=_PREC)
            Vt = jnp.einsum("cji,cjk->cik", Jj[cl_idx], Lc, precision=_PREC)
            Vf = Vf * free_ext[cl_from][:, None, None]
            Vt = Vt * free_ext[cl_to][:, None, None]
            Hcl_f = jnp.einsum("cik,cjk->cij", Vf, Vf, precision=_PREC)
            Hcl_t = jnp.einsum("cik,cjk->cij", Vt, Vt, precision=_PREC)
            Hcl = (
                jnp.einsum("cn,cij->nij", Sf, Hcl_f, precision=_PREC)
                + jnp.einsum("cn,cij->nij", St, Hcl_t, precision=_PREC)
            )
            # 1e-4 floor keeps T invertible for closure-only/isolated
            # nodes — O(1e-4) extra damping vs info scales of O(100)
            Dm = (Hb - Hcl) + jax.vmap(jnp.diag)(damp) + 1e-4 * eye6
            if config.optimize_xy_only:
                Dm = Dm + jnp.diag(1.0 - cmask)
            Dm = jnp.where(free[:, None, None] > 0, Dm, eye6)
            flv, frt, _ = tridiag.block_tridiag_factor(
                Dm, U, dense_cutoff=config.chain_dense_cutoff,
                root_ns=config.chain_root_ns,
            )
            B = (
                jnp.einsum("cn,cik->nick", Sf, Vf, precision=_PREC)
                + jnp.einsum("cn,cik->nick", St, Vt, precision=_PREC)
            ).reshape(n, 6, K)
            Z = tridiag.block_tridiag_apply((flv, frt, n), B)
            Zf = jnp.einsum("cn,nik->cik", Sf, Z, precision=_PREC)
            Zt = jnp.einsum("cn,nik->cik", St, Z, precision=_PREC)
            Kmat = jnp.eye(K, dtype=dt) + (
                jnp.einsum("cji,cjk->cik", Vf, Zf, precision=_PREC)
                + jnp.einsum("cji,cjk->cik", Vt, Zt, precision=_PREC)
            ).reshape(K, K)
            Kinv = _newton_schulz_inverse(Kmat, config.woodbury_ns_iters)
            P = jnp.einsum("nik,kl->nil", Z, Kinv, precision=_PREC)
            return flv, frt, Vf, Vt, P

        def pack_apply(pack, rr):
            flv, frt, Vf, Vt, P = pack
            q = tridiag.block_tridiag_apply((flv, frt, n), rr)
            qf = jnp.einsum("cn,ni->ci", Sf, q, precision=_PREC)
            qt = jnp.einsum("cn,ni->ci", St, q, precision=_PREC)
            u = (
                jnp.einsum("cji,cj->ci", Vf, qf, precision=_PREC)
                + jnp.einsum("cji,cj->ci", Vt, qt, precision=_PREC)
            ).reshape(-1)
            return q - jnp.einsum("nik,k->ni", P, u, precision=_PREC)

    else:
        def build_pack(Ji, Jj, W, Hb, U, damp):
            Dm = jnp.where(
                free[:, None, None] > 0,
                Hb + jax.vmap(jnp.diag)(damp),
                eye6,
            )
            if config.optimize_xy_only:
                Dm = Dm + jnp.diag(1.0 - cmask)
            flv, frt, _ = tridiag.block_tridiag_factor(
                Dm, U, dense_cutoff=config.chain_dense_cutoff,
                root_ns=config.chain_root_ns,
            )
            return flv, frt

        def pack_apply(pack, rr):
            return tridiag.block_tridiag_apply((pack[0], pack[1], n), rr)

    # iteration 0 always builds the pack; carrying it through the loop
    # keeps the refresh amortization without a chunked scan
    Ji0, Jj0, W0, _, Hb0, U0 = linearize(r0)
    damp0 = jnp.asarray(config.lambda_init, dt) * jnp.maximum(
        jax.vmap(jnp.diag)(Hb0), 1e-6
    )
    pack0 = build_pack(Ji0, Jj0, W0, Hb0, U0, damp0)

    def cond(c):
        it, _, _, _, _, _, _, _, _, done = c
        return (~done) & (it < config.iterations)

    def body(c):
        it, poses, r, lam, chi2_cur, pack, stale, hist, acc, done = c
        Ji, Jj, W, grad, Hb, U = linearize(r)
        hdiag = jax.vmap(jnp.diag)(Hb)
        damp = lam * jnp.maximum(hdiag, 1e-6)

        # refresh on schedule OR right after a rejected step — a reject
        # means the (stale-preconditioned) step was poor and λ moved 3x,
        # so the next solve needs the preconditioner at the new damping
        pack = jax.lax.cond(
            (stale >= refresh) | (it == 0),
            lambda _: build_pack(Ji, Jj, W, Hb, U, damp),
            lambda _: pack,
            None,
        )
        stale = jnp.where((stale >= refresh) | (it == 0), 0, stale)
        if use_split:
            hvp = _make_split_hvp(g, Ji, Jj, W, Hb, U, closure, damp, free)
        else:
            hvp = _make_hvp(g, Ji, Jj, W, damp, free, edge_ops=edge_ops)
        apply_minv = lambda rr: pack_apply(pack, rr)
        if config.optimize_xy_only:
            base_hvp, base_minv = hvp, apply_minv
            hvp = lambda v: base_hvp(v * cmask) * cmask
            apply_minv = lambda rr: base_minv(rr * cmask) * cmask
            grad = grad * cmask
        dx = _pcg(hvp, apply_minv, -grad, config.pcg_iterations,
                  config.pcg_tol, unroll=config.unroll_pcg)
        dx = dx * free[:, None]

        cand = lie.pose_retract(poses, dx)
        r_cand = factors.batched_residuals(
            gath_from(cand), gath_to(cand), g.e_transform
        )
        chi2_new = _robust_chi2_from_r(g, r_cand, config.huber_delta)
        accept = chi2_new < chi2_cur
        gain = (chi2_cur - chi2_new) / jnp.maximum(chi2_cur, 1e-12)
        poses = jnp.where(accept, cand, poses)
        r = jnp.where(accept, r_cand, r)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        lam_next = jnp.clip(
            jnp.where(accept, lam / config.lambda_factor, lam * config.lambda_factor),
            config.lambda_min,
            config.lambda_max,
        )
        # g2o-parity termination: converged (tiny accepted gain WITH the
        # damping already relaxed — tiny gain at large λ only means the
        # trust region is small, not that the optimum is reached) or
        # stuck (rejected step with λ already at its ceiling)
        done = (
            accept
            & (gain < config.early_exit_tol)
            & (lam <= config.lambda_init)
        ) | ((~accept) & (lam >= config.lambda_max))
        hist = hist.at[it].set(chi2_cur)
        acc = acc.at[it].set(accept)
        stale_next = jnp.where(accept, stale + 1, refresh)
        return (it + 1, poses, r, lam_next, chi2_cur, pack, stale_next,
                hist, acc, done)

    if not config.early_exit:
        # Fixed-iteration form for FLEETS: under vmap a data-dependent
        # refresh cond runs both branches every iteration and a while_loop
        # runs to the slowest lane anyway — a structural chunked scan
        # (factor ONCE per refresh chunk, no conds) is strictly cheaper
        # and keeps the r4 fixed-20 semantics.
        def chunk(carry, chunk_idx):
            poses_c, r_c, lam_c, chi2_c = carry
            Ji, Jj, W, _, Hb, U = linearize(r_c)
            damp_c = lam_c * jnp.maximum(jax.vmap(jnp.diag)(Hb), 1e-6)
            pack_c = build_pack(Ji, Jj, W, Hb, U, damp_c)

            def inner(c2, step_idx):
                poses, r, lam, chi2_cur = c2
                Ji, Jj, W, grad, Hb, U = linearize(r)
                damp = lam * jnp.maximum(jax.vmap(jnp.diag)(Hb), 1e-6)
                if use_split:
                    hvp = _make_split_hvp(g, Ji, Jj, W, Hb, U, closure,
                                          damp, free)
                else:
                    hvp = _make_hvp(g, Ji, Jj, W, damp, free,
                                    edge_ops=edge_ops)
                apply_minv = lambda rr: pack_apply(pack_c, rr)
                grad_m = grad
                if config.optimize_xy_only:
                    base_hvp, base_minv = hvp, apply_minv
                    hvp = lambda v: base_hvp(v * cmask) * cmask
                    apply_minv = lambda rr: base_minv(rr * cmask) * cmask
                    grad_m = grad * cmask
                dx = _pcg(hvp, apply_minv, -grad_m, config.pcg_iterations,
                          config.pcg_tol, unroll=config.unroll_pcg)
                dx = dx * free[:, None]
                cand = lie.pose_retract(poses, dx)
                r_cand = factors.batched_residuals(
                    gath_from(cand), gath_to(cand), g.e_transform
                )
                chi2_new = _robust_chi2_from_r(g, r_cand, config.huber_delta)
                do = step_idx < config.iterations
                accept = (chi2_new < chi2_cur) & do
                poses = jnp.where(accept, cand, poses)
                r = jnp.where(accept, r_cand, r)
                chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
                lam_next = jnp.clip(
                    jnp.where(accept, lam / config.lambda_factor,
                              lam * config.lambda_factor),
                    config.lambda_min, config.lambda_max,
                )
                lam = jnp.where(do, lam_next, lam)
                return (poses, r, lam, chi2_cur), (chi2_cur, accept)

            steps = chunk_idx * refresh + jnp.arange(refresh)
            return jax.lax.scan(
                inner, carry, steps,
                unroll=min(config.unroll_lm, refresh),
            )

        n_chunks = -(-config.iterations // refresh)
        init_f = (g.pose, r0, jnp.asarray(config.lambda_init, dt), chi2_0)
        (poses, _, lam, _), (hist, acc) = jax.lax.scan(
            chunk, init_f, jnp.arange(n_chunks)
        )
        hist = hist.reshape(-1)[: config.iterations]
        acc = acc.reshape(-1)[: config.iterations]
        return poses, lam, jnp.concatenate([chi2_0[None], hist]), acc

    hist0 = jnp.full((config.iterations,), chi2_0, dtype=dt)
    acc0 = jnp.zeros((config.iterations,), dtype=bool)
    init = (jnp.asarray(0, jnp.int32), g.pose, r0,
            jnp.asarray(config.lambda_init, dt), chi2_0,
            pack0, jnp.asarray(0, jnp.int32), hist0, acc0,
            jnp.asarray(False))
    it, poses, _, lam, chi2_f, _, _, hist, acc, _ = jax.lax.while_loop(
        cond, body, init
    )
    # entries past termination carry the final chi2 (flat tail)
    steps = jnp.arange(config.iterations)
    hist = jnp.where(steps < it, hist, chi2_f)
    return poses, lam, jnp.concatenate([chi2_0[None], hist]), acc


# ---------------------------------------------------------------------------
# The LM loop
# ---------------------------------------------------------------------------

def _robust_chi2_from_r(g: GraphState, r: jax.Array, huber_delta: float,
                        reduce=_identity_reduce) -> jax.Array:
    chi2 = factors.edge_chi2(r, g.e_info)
    # Robust (Huber) total cost, as g2o's activeRobustChi2.
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    rho = jnp.where(
        e <= huber_delta, chi2, 2.0 * huber_delta * e - huber_delta**2
    )
    return reduce(jnp.sum(rho * g.e_valid))


def total_chi2(g: GraphState, poses: jax.Array, huber_delta: float,
               reduce=_identity_reduce) -> jax.Array:
    r = factors.batched_residuals(poses[g.e_from], poses[g.e_to], g.e_transform)
    return _robust_chi2_from_r(g, r, huber_delta, reduce)


def lm_loop(g: GraphState, free: jax.Array, config: SolverConfig,
            reduce=_identity_reduce):
    """The LM iteration core, shared by single-chip and edge-sharded solves.

    ``g``'s edge table may be a device-local shard (with poses replicated);
    ``reduce`` must then psum partial reductions across the edge axis.
    Returns (poses, final_lambda, chi2_history, accepted).
    """
    r0 = factors.batched_residuals(
        g.pose[g.e_from], g.pose[g.e_to], g.e_transform
    )
    chi2_0 = _robust_chi2_from_r(g, r0, config.huber_delta, reduce)
    # Measurements are constant across the solve, so Ad_{meas⁻¹} is hoisted
    # out of the LM loop; together with the residual twist carried forward
    # from the accepted candidate's χ² pass, each iteration's linearization
    # needs NO pose gathers and NO residual recompute (TPU row gathers at
    # 100k edges are the expensive part, not the 6x6 algebra).
    adj_meas_inv = jax.vmap(lambda m: lie.se3_adjoint(lie.pose_inverse(m)))(
        g.e_transform
    )

    if reduce is _identity_reduce and config.mode == "direct":
        # exact Woodbury solve per iteration — optional: XLA's K×K
        # Cholesky on TPU is a sequential blocked loop, so this loses to
        # chain-PCG there (kept for CPU/debug and as the exactness oracle)
        return _lm_loop_direct(g, free, config, r0, chi2_0, adj_meas_inv)
    if (
        reduce is _identity_reduce
        and config.preconditioner in ("chain", "woodbury")
        and config.mode == "auto"
    ):
        # handles BOTH termination modes: early_exit=True -> g2o-parity
        # while_loop; early_exit=False -> fixed-iteration chunked scan
        # (the fleet form). mode="pcg" keeps the generic scan path for
        # apples-to-apples benchmarking.
        return _lm_loop_fast(g, free, config, r0, chi2_0, adj_meas_inv)

    def linearize_from_r(r):
        W = _weighted_info(g, r, config.huber_delta)
        Ji, Jj = factors.jacobians_from_residual(r, adj_meas_inv)
        return Ji, Jj, W

    use_chain = config.preconditioner in ("chain", "woodbury")
    # Dense/sparse Hv split needs the whole edge table on-device; the
    # edge-sharded solve (reduce = psum) keeps the classic scatter form.
    # Below ~4k nodes the solve is XLA-op-latency-bound, not scatter-bound,
    # and the split's extra dense ops would only add kernels.
    use_split = reduce is _identity_reduce and g.node_capacity >= config.split_hv_threshold
    if use_split:
        ccap = max(int(config.closure_fraction * g.edge_capacity), 64)
        closure = closure_partition(g, min(ccap, g.edge_capacity))

    def build_chain_factor(r, lam):
        """Factor the damped block-tridiagonal part at the CURRENT iterate.

        Re-run once per ``precond_refresh`` LM iterations — the factor is
        the dominant per-iteration cost at >=10k nodes, and a slightly
        stale SPD preconditioner costs only CG convergence rate, never
        correctness.
        """
        from uzliti_slam_tpu.graph import tridiag

        Ji, Jj, W = linearize_from_r(r)
        Hblocks = _hessian_diag_blocks(g, Ji, Jj, W, reduce)
        hdiag = jax.vmap(jnp.diag)(Hblocks)
        damp = lam * jnp.maximum(hdiag, 1e-6)
        U = reduce(tridiag.chain_offdiag_blocks(g, Ji, Jj, W, free))
        eye = jnp.eye(6)
        Dm = jnp.where(
            free[:, None, None] > 0,
            Hblocks + jax.vmap(jnp.diag)(damp),
            eye,
        )
        return tridiag.block_tridiag_factor(
            Dm, U, dense_cutoff=config.chain_dense_cutoff,
            root_ns=config.chain_root_ns,
        )

    def make_lm_step(chain_factor):
        def lm_step(carry, step_idx):
            poses, r, lam, chi2_cur = carry
            Ji, Jj, W = linearize_from_r(r)
            grad = _gradient(g, r, Ji, Jj, W, free, reduce)
            Hblocks = _hessian_diag_blocks(g, Ji, Jj, W, reduce)
            # Marquardt scaling: damp with λ·diag(H) (floored for stability).
            hdiag = jax.vmap(jnp.diag)(Hblocks)
            damp = lam * jnp.maximum(hdiag, 1e-6)
            if use_split:
                from uzliti_slam_tpu.graph import tridiag

                U_h = reduce(tridiag.chain_offdiag_blocks(g, Ji, Jj, W, free))
                hvp = _make_split_hvp(g, Ji, Jj, W, Hblocks, U_h, closure, damp, free)
            else:
                hvp = _make_hvp(g, Ji, Jj, W, damp, free, reduce)
            if chain_factor is not None:
                from uzliti_slam_tpu.graph import tridiag

                apply_minv = lambda r: tridiag.block_tridiag_apply(chain_factor, r)
            else:
                Minv = _block_jacobi_inverse(Hblocks, damp, free)
                apply_minv = lambda r: jnp.einsum("nij,nj->ni", Minv, r, precision=_PREC)
            if config.optimize_xy_only:
                # project the whole linear solve onto the x/y/yaw subspace:
                # gradient, operator and preconditioner all see P A P — masked
                # coordinates carry zero residual and zero update
                cmask = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0])
                base_hvp, base_minv = hvp, apply_minv
                hvp = lambda v: base_hvp(v * cmask) * cmask
                apply_minv = lambda r: base_minv(r * cmask) * cmask
                grad = grad * cmask
            dx = _pcg(hvp, apply_minv, -grad, config.pcg_iterations,
                      config.pcg_tol, unroll=config.unroll_pcg)
            dx = dx * free[:, None]

            cand = lie.pose_retract(poses, dx)
            r_cand = factors.batched_residuals(
                cand[g.e_from], cand[g.e_to], g.e_transform
            )
            chi2_new = _robust_chi2_from_r(g, r_cand, config.huber_delta, reduce)
            # steps past config.iterations (trailing partial chunk) are no-ops
            do = step_idx < config.iterations
            accept = (chi2_new < chi2_cur) & do
            poses = jnp.where(accept, cand, poses)
            r = jnp.where(accept, r_cand, r)
            chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
            lam_next = jnp.clip(
                jnp.where(accept, lam / config.lambda_factor, lam * config.lambda_factor),
                config.lambda_min,
                config.lambda_max,
            )
            lam = jnp.where(do, lam_next, lam)
            return (poses, r, lam, chi2_cur), (chi2_cur, accept)

        return lm_step

    init = (g.pose, r0, jnp.asarray(config.lambda_init), chi2_0)
    if use_chain:
        refresh = max(1, min(int(config.precond_refresh), config.iterations))
        n_chunks = -(-config.iterations // refresh)

        def chunk(carry, chunk_idx):
            _, r, lam, _ = carry
            factor = build_chain_factor(r, lam)
            steps = chunk_idx * refresh + jnp.arange(refresh)
            return jax.lax.scan(make_lm_step(factor), carry, steps,
                                unroll=min(config.unroll_lm, refresh))

        (poses, _, lam, _), (chi2_hist, accepted) = jax.lax.scan(
            chunk, init, jnp.arange(n_chunks)
        )
        chi2_hist = chi2_hist.reshape(-1)[: config.iterations]
        accepted = accepted.reshape(-1)[: config.iterations]
    else:
        (poses, _, lam, _), (chi2_hist, accepted) = jax.lax.scan(
            make_lm_step(None),
            init,
            jnp.arange(config.iterations),
            unroll=min(config.unroll_lm, config.iterations),
        )
    return poses, lam, jnp.concatenate([chi2_0[None], chi2_hist]), accepted


def optimize(g: GraphState, config: SolverConfig = SolverConfig()) -> tuple[GraphState, SolveStats]:
    """Run LM on the pose graph; returns updated graph + stats.

    Dispatches through a jit cache keyed on (array shapes, config): repeat
    solves — the common case for a live pipeline and for the test suite —
    skip re-tracing entirely.  Inside an enclosing jit/vmap/shard_map the
    nested jit is inlined, so transformed callers are unaffected.
    """
    return _optimize_jit(g, config)


@functools.partial(jax.jit, static_argnames="config")
def _optimize_jit(g: GraphState, config: SolverConfig) -> tuple[GraphState, SolveStats]:
    """Write-back semantics follow the reference ``storeImpl``
    (``g2o_optimizer.cpp:106-135``): poses updated, per-edge chi2 errors
    recomputed, edge ages incremented.
    """
    e_meas_raw = g.e_transform
    if config.use_odometry_calibration:
        # remap odometry measurements through the drift model INSIDE the
        # optimizer (g2o_optimizer.cpp:209-227); raw measurements are
        # restored on write-back — calibration refines the model, it never
        # rewrites sensor data
        from uzliti_slam_tpu.graph import calibration

        is_odom = g.e_type == EDGE_TYPE_2D_WHEEL_ODOMETRY
        corrected = calibration.odometry_drift_correct(
            g.e_transform, g.odom_params
        )
        g = g._replace(
            e_transform=jnp.where(is_odom[:, None], corrected, g.e_transform)
        )
    if config.optimize_xy_only:
        # flatten vertices first, as the reference does at addVertex
        # (z = 0, roll = pitch = 0, g2o_optimizer.cpp:164-170)
        flat = lie.pose2_to_pose(lie.pose_to_pose2(g.pose))
        g = g._replace(pose=jnp.where(g.node_valid[:, None], flat, g.pose))
    labels = connected_components(g)
    gauge = gauge_fix_mask(g, labels)
    free = (g.node_valid & ~gauge).astype(g.pose.dtype)

    if config.odometry_restart:
        # Second start: the odometry-prior trajectory re-anchored into the
        # map frame (diff ∘ odom, the reference's re-anchor transform,
        # graph_slam_node.cpp:1259-1270). Scope-boundary anchors
        # (node_fixed) keep their authoritative poses.
        odo_start = lie.pose_compose(g.diff_transform[None], g.odom_pose)
        if config.optimize_xy_only:
            odo_start = lie.pose2_to_pose(lie.pose_to_pose2(odo_start))
        movable = g.node_valid & ~g.node_fixed
        odo_start = jnp.where(movable[:, None], odo_start, g.pose)

        # Solve from the refined (current) state first; launch the second
        # solve from the odometry prior ONLY when the first did not land
        # clearly below the prior's chi2 (lax.cond skips the work at run
        # time).  A converged steady-state epoch — the common case — ends
        # orders of magnitude below the raw prior and pays ~1x; the bad
        # cases the multi-start exists for (near-perfect odometry whose
        # prior chi2 is LOW, a poor basin whose final chi2 is HIGH) always
        # trip the margin and keep the rescue armed.
        poses_a, lam_a, hist_a, acc_a = lm_loop(g, free, config)
        chi2_prior = total_chi2(g, odo_start, config.huber_delta)
        need = hist_a[-1] > config.restart_chi2_margin * chi2_prior

        def with_restart(_):
            poses_b, lam_b, hist_b, acc_b = lm_loop(
                g._replace(pose=odo_start), free, config
            )
            b_wins = hist_b[-1] < hist_a[-1]
            return (
                jnp.where(b_wins, poses_b, poses_a),
                jnp.where(b_wins, lam_b, lam_a),
                jnp.where(b_wins, hist_b, hist_a),
                jnp.where(b_wins, acc_b, acc_a),
            )

        def without(_):
            return poses_a, lam_a, hist_a, acc_a

        poses, lam, chi2_hist, accepted = jax.lax.cond(
            need, with_restart, without, None
        )
    else:
        poses, lam, chi2_hist, accepted = lm_loop(g, free, config)

    # Write back errors and ages (g2o_optimizer.cpp:106-135). Errors are
    # computed against the (possibly drift-corrected) solve measurements;
    # the stored measurements revert to raw.
    r = factors.batched_residuals(poses[g.e_from], poses[g.e_to], g.e_transform)
    e_err = factors.edge_chi2(r, g.e_info) * g.e_valid
    g = g._replace(
        pose=poses,
        e_error=e_err,
        e_age=g.e_age + g.e_valid.astype(g.e_age.dtype),
        e_transform=e_meas_raw,
    )
    stats = SolveStats(
        chi2_history=chi2_hist,
        accepted=accepted,
        final_lambda=lam,
        num_gauge_fixed=jnp.sum(gauge).astype(jnp.int32),
    )
    return g, stats
