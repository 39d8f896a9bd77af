"""Block cyclic-reduction tridiagonal solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.graph import tridiag

KEY = jax.random.PRNGKey(0)


def random_spd_tridiag(key, n):
    k1, k2 = jax.random.split(key)
    A_half = jax.random.normal(k1, (n, 6, 6)) * 0.3
    D = jnp.einsum("nij,nkj->nik", A_half, A_half) + 4.0 * jnp.eye(6)
    U = jax.random.normal(k2, (n, 6, 6)) * 0.3
    U = U.at[n - 1].set(0.0)
    return D, U


def dense_from_blocks(D, U, n):
    A = np.zeros((6 * n, 6 * n))
    for i in range(n):
        A[6*i:6*i+6, 6*i:6*i+6] = np.asarray(D[i])
        if i + 1 < n:
            A[6*i:6*i+6, 6*(i+1):6*(i+1)+6] = np.asarray(U[i])
            A[6*(i+1):6*(i+1)+6, 6*i:6*i+6] = np.asarray(U[i]).T
    return A


class TestInv6:
    def test_spd_inverse(self):
        X = jax.random.normal(KEY, (64, 6, 6))
        M = X @ jnp.swapaxes(X, -1, -2) + 0.5 * jnp.eye(6)
        Minv = tridiag._inv6(M)
        err = np.max(np.abs(np.asarray(Minv @ M) - np.eye(6)))
        assert err < 1e-2  # f32 adjugate on conditioned SPD blocks

    def test_ill_conditioned_stays_finite(self):
        M = jnp.diag(jnp.array([1e6, 1.0, 1e-6, 1.0, 1.0, 1.0]))[None]
        Minv = tridiag._inv6(M)
        assert np.all(np.isfinite(np.asarray(Minv)))


class TestTridiag:
    def test_matches_dense_pow2(self):
        n = 16
        D, U = random_spd_tridiag(KEY, n)
        b = jax.random.normal(jax.random.PRNGKey(2), (n, 6))
        x = tridiag.block_tridiag_solve(D, U, b)
        A = dense_from_blocks(D, U, n)
        x_ref = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(n, 6)
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-3, rtol=1e-3)

    def test_matches_dense_odd_size(self):
        for n in (1, 3, 7, 13):
            D, U = random_spd_tridiag(jax.random.PRNGKey(n), n)
            b = jax.random.normal(jax.random.PRNGKey(100 + n), (n, 6))
            x = tridiag.block_tridiag_solve(D, U, b)
            A = dense_from_blocks(D, U, n)
            x_ref = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(n, 6)
            np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-3, rtol=1e-3)

    def test_block_diagonal_case(self):
        n = 8
        D, _ = random_spd_tridiag(KEY, n)
        U = jnp.zeros((n, 6, 6))
        b = jax.random.normal(jax.random.PRNGKey(3), (n, 6))
        x = tridiag.block_tridiag_solve(D, U, b)
        for i in range(n):
            np.testing.assert_allclose(
                np.asarray(x[i]),
                np.linalg.solve(np.asarray(D[i]), np.asarray(b[i])),
                atol=1e-4, rtol=1e-4,
            )

    def test_large_chain_jit(self):
        n = 1000
        D, U = random_spd_tridiag(KEY, n)
        b = jax.random.normal(jax.random.PRNGKey(4), (n, 6))
        x = jax.jit(tridiag.block_tridiag_solve)(D, U, b)
        # residual check instead of dense solve
        Ax = jnp.einsum("nij,nj->ni", D, x)
        Ax = Ax.at[:-1].add(jnp.einsum("nij,nj->ni", U[:-1], x[1:]))
        Ax = Ax.at[1:].add(jnp.einsum("nji,nj->ni", U[:-1], x[:-1]))
        rel = float(jnp.linalg.norm(Ax - b) / jnp.linalg.norm(b))
        assert rel < 1e-3
