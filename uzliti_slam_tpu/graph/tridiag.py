"""Block-tridiagonal solves via cyclic reduction — the chain preconditioner.

Block-Jacobi PCG stalls on trajectory graphs: the odometry chain couples
pose i only to i±1, so CG needs O(N) iterations to move information across
a 100k-node trajectory.  The classic fix is to precondition with the exact
solve of the **tridiagonal part** of the Gauss-Newton Hessian (diagonal
blocks + consecutive-pose couplings).  Sparse Cholesky would solve that
chain sequentially; here it is **block cyclic reduction**: log2(N) sweeps,
each a batch of 6×6 inverses/matmuls over the surviving indices — exactly
the parallel-scan shape TPUs like (SURVEY.md §7 "Hard parts": sparse
block-Cholesky has no TPU idiom; this is its chain-structured replacement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _inv3(M):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    Pure element-wise VPU arithmetic — no dynamic slicing, no custom
    calls; the building block for the Schur-based 6x6 inverse below.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv = jnp.stack(
        [
            A, -(b * i - c * h), b * f - c * e,
            B, a * i - c * g, -(a * f - c * d),
            C, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(M.shape)
    return inv / det[..., None, None]


def _inv6(M):
    """Batched SPD-ish 6x6 inverse with damping floor.

    2x2-block Schur inversion over 3x3 sub-blocks, each inverted in
    closed form (adjugate): entirely element-wise/matmul VPU work with
    no sequential elimination sweeps — the former unrolled Gauss-Jordan
    spent most of its time in six dependent dynamic-update-slice passes,
    which dominated the cyclic-reduction factor at 100k nodes.
    """
    eye = jnp.eye(6, dtype=M.dtype)
    M = M + 1e-8 * eye
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ainv = _inv3(A)
    AinvB = Ainv @ B
    S = D - C @ AinvB          # Schur complement of A (SPD for damped SPD M)
    Sinv = _inv3(S)
    CAinv = C @ Ainv
    TL = Ainv + AinvB @ Sinv @ CAinv
    TR = -AinvB @ Sinv
    BL = -Sinv @ CAinv
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pad_pow2(D, U, b):
    n = D.shape[0]
    n2 = 1 << max((n - 1).bit_length(), 0)
    if n2 == n:
        return D, U, b, n
    pad = n2 - n
    eye = jnp.broadcast_to(jnp.eye(6, dtype=D.dtype), (pad, 6, 6))
    D = jnp.concatenate([D, eye])
    U = jnp.concatenate([U, jnp.zeros((pad, 6, 6), D.dtype)])[:n2]
    b = jnp.concatenate([b, jnp.zeros((pad,) + b.shape[1:], D.dtype)])
    return D, U, b, n


def newton_schulz_inverse(A: jax.Array, iters: int = 16) -> jax.Array:
    """Approximate inverse of an SPD matrix by Newton-Schulz iteration.

    X ← X(2I − AX), initialized at Aᵀ/(‖A‖₁‖A‖∞) (guaranteed convergent).
    Pure dense matmuls — under vmap every instance shares the SAME batched
    matmul kernels, whereas XLA's LU/Cholesky custom calls serialize per
    vmapped instance on TPU.  Falls back to the diagonal inverse if the
    iteration diverges (preconditioner-grade accuracy suffices).
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


def _dense_root_inverse(Dk: jax.Array, Uk: jax.Array,
                        root_ns: bool = False) -> jax.Array:
    """Dense inverse of the remaining (m·6)×(m·6) block-tridiagonal system.

    Cyclic reduction's deepest levels run batches too small to fill the
    VPU — each is a latency-bound kernel, and there are 2·log2(m) of them
    per CG substitution.  Cutting over to ONE dense inverse (MXU matmul
    shapes) replaces all of them with a single matvec per apply.

    ``root_ns``: invert via Newton-Schulz (batched matmuls) instead of LU
    — the fleet path's choice, since vmapped LU serializes per instance on
    TPU while NS matmuls batch across the whole fleet.  NS is approximate
    (preconditioner-grade), which only costs CG convergence rate.
    """
    m = Dk.shape[0]
    if m == 1:
        # single surviving block: closed-form 6x6 inverse (keeps the fully
        # batched dense_cutoff=1 path free of LU custom calls, which TPU
        # serializes per vmapped instance)
        return _inv6(Dk[0])
    A = jnp.zeros((m, 6, m, 6), Dk.dtype)
    idx = jnp.arange(m)
    A = A.at[idx, :, idx, :].set(Dk)
    if m > 1:
        A = A.at[idx[:-1], :, idx[1:], :].set(Uk[: m - 1])
        A = A.at[idx[1:], :, idx[:-1], :].set(jnp.swapaxes(Uk[: m - 1], -1, -2))
    A = A.reshape(m * 6, m * 6)
    A = A + 1e-8 * jnp.eye(m * 6, dtype=Dk.dtype)
    if root_ns:
        return newton_schulz_inverse(A)
    return jnp.linalg.inv(A)


def block_tridiag_factor(D: jax.Array, U: jax.Array, dense_cutoff: int = 64,
                         root_ns: bool = False):
    """Cyclic-reduction 'factorization' of a symmetric block-tridiagonal A.

    D: (n, 6, 6) diagonal blocks; U: (n, 6, 6) with U[i] = A[i, i+1]
    (U[n-1] is explicitly zeroed — for any n, not just the padded size).
    Returns an opaque factor object for ``block_tridiag_apply`` so the
    matrix-dependent work (per-level 6x6 inverses + Schur products) runs
    ONCE per linearization, while each CG iteration only does the cheap
    b-dependent forward/back substitutions.

    Reduction stops once ≤ ``dense_cutoff`` blocks remain; the root system
    is then inverted densely (one (m·6)² matrix) so each apply finishes in
    a single matvec instead of log2(m) more latency-bound tiny levels.
    """
    n_orig = D.shape[0]
    U = U.at[n_orig - 1].set(jnp.zeros((6, 6), D.dtype))
    b0 = jnp.zeros((n_orig, 6), D.dtype)
    D, U, _, _ = _pad_pow2(D, U, b0)

    levels = []
    Dk, Uk = D, U
    while Dk.shape[0] > max(dense_cutoff, 1):
        De, Do = Dk[0::2], Dk[1::2]
        Ueo = Uk[0::2]          # couples even j -> odd j+1
        Uoe = Uk[1::2]          # couples odd j+1 -> even j+2
        Dinv_o = _inv6(Do)
        Uoe_m = jnp.roll(Uoe, 1, axis=0).at[0].set(0.0)
        Dinv_om = jnp.roll(Dinv_o, 1, axis=0).at[0].set(jnp.eye(6, dtype=D.dtype))

        # Apply-side products are precomputed HERE (matrix-dependent, once
        # per factor) so each CG substitution level does two matvecs and a
        # shift instead of chained triple products — the per-level kernel
        # count is what bounds the latency of the 2·log2(n) apply sweep.
        P1m = jnp.einsum("nji,njk->nik", Uoe_m, Dinv_om, precision=_PREC)
        P2 = jnp.einsum("nij,njk->nik", Ueo, Dinv_o, precision=_PREC)
        G1 = jnp.einsum("nij,nkj->nik", Dinv_o, Ueo, precision=_PREC)
        G2 = jnp.einsum("nij,njk->nik", Dinv_o, Uoe, precision=_PREC)

        t1 = jnp.einsum("nij,njk->nik", P1m, Uoe_m, precision=_PREC)
        t2 = jnp.einsum("nij,nkj->nik", P2, Ueo, precision=_PREC)
        newD = De - t1 - t2
        newU = -jnp.einsum("nij,njk->nik", P2, Uoe, precision=_PREC)
        newU = newU.at[-1].set(0.0)
        levels.append((Dinv_o, P1m, P2, G1, G2))
        Dk, Uk = newD, newU

    root_inv = _dense_root_inverse(Dk, Uk, root_ns=root_ns)
    # tuple: the factor is carried through lax.while_loop by the solver's
    # early-exit path, so its pytree structure must be hashable/stable
    return (tuple(levels), root_inv, n_orig)


def block_tridiag_apply(factor, b: jax.Array) -> jax.Array:
    """Solve A x = b using a ``block_tridiag_factor`` result.

    ``b`` may be a single RHS (n, 6) or a multi-RHS stack (n, 6, K) — the
    direct Woodbury solver pushes the whole compacted closure block matrix
    plus the gradient through ONE substitution sweep, so the per-level
    einsums run K-wide (MXU shapes) instead of K sequential applies.
    """
    levels, root_inv, n_orig = factor
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]
    n2 = 1 << max((n_orig - 1).bit_length(), 0)
    if n2 != n_orig:
        b = jnp.concatenate(
            [b, jnp.zeros((n2 - n_orig,) + b.shape[1:], b.dtype)]
        )

    # forward: reduce b through the levels, remembering per-level odd parts
    b_levels = []
    bk = b
    for Dinv_o, P1m, P2, G1, G2 in levels:
        be, bo = bk[0::2], bk[1::2]
        bo_m = jnp.roll(bo, 1, axis=0).at[0].set(0.0)
        b_levels.append(bo)
        bk = (
            be
            - jnp.einsum("nij,njk->nik", P1m, bo_m, precision=_PREC)
            - jnp.einsum("nij,njk->nik", P2, bo, precision=_PREC)
        )

    # dense root solve: one matmul over the remaining m blocks
    m_root = root_inv.shape[0] // 6
    K = bk.shape[-1]
    x = jnp.einsum(
        "ij,jk->ik", root_inv, bk.reshape(-1, K), precision=_PREC
    ).reshape(m_root, 6, K)

    for (Dinv_o, P1m, P2, G1, G2), bo in zip(reversed(levels), reversed(b_levels)):
        m = 2 * bo.shape[0]
        x_e = x
        x_e_next = jnp.roll(x_e, -1, axis=0).at[-1].set(0.0)
        x_o = (
            jnp.einsum("nij,njk->nik", Dinv_o, bo, precision=_PREC)
            - jnp.einsum("nij,njk->nik", G1, x_e, precision=_PREC)
            - jnp.einsum("nij,njk->nik", G2, x_e_next, precision=_PREC)
        )
        x = jnp.stack([x_e, x_o], axis=1).reshape(m, 6, K)

    x = x[:n_orig]
    return x[..., 0] if squeeze else x


def block_tridiag_solve(D: jax.Array, U: jax.Array, b: jax.Array) -> jax.Array:
    """One-shot solve A x = b (factor + apply)."""
    return block_tridiag_apply(block_tridiag_factor(D, U), b)


def chain_offdiag_blocks(g, Ji, Jj, W, free) -> jax.Array:
    """Assemble U[i] = H[i, i+1]: couplings from edges between consecutive
    slots (the odometry/laser chain). (N, 6, 6); rows with a fixed/invalid
    endpoint are zeroed (decoupled)."""
    n = g.node_capacity
    consecutive = (g.e_to == g.e_from + 1) & g.e_valid
    contrib = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Jj, precision=_PREC)
    contrib = contrib * consecutive[:, None, None]
    U = jax.ops.segment_sum(contrib, jnp.where(consecutive, g.e_from, n), num_segments=n + 1)[:n]
    both_free = (free[:, None, None] > 0) & (jnp.roll(free, -1)[:, None, None] > 0)
    return U * both_free
