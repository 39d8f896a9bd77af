"""Pallas TPU kernel: packed-descriptor Hamming distance matrix.

The matching path's hot op (SURVEY.md §7: "Bitwise kernels (Hamming
popcount matmul) need Pallas to hit speed-of-light").  Descriptors stay
packed (32 bytes viewed as 8×int32 words); each (TM × TN) output tile
XORs a word-broadcast pair and reduces ``population_count`` over the 8
words — no 8× bit-unpack traffic, no MXU dependency, pure VPU.

Falls back to the XLA unpack+matmul path (``ops.matching``) where Pallas
is unavailable (CPU tests run the kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


WORDS = 8  # 32 bytes = 8 x int32


def _kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]                      # (TM, 8) int32 words
    b = b_ref[:]                      # (TN, 8) int32 words
    x = jax.lax.bitwise_xor(a[:, None, :], b[None, :, :])   # (TM, TN, 8)
    pc = jax.lax.population_count(x)
    out_ref[:] = jnp.sum(pc, axis=-1).astype(jnp.int32)


def _pad_rows(x: jax.Array, mult: int) -> jax.Array:
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def hamming_matrix_packed_pallas(
    a: jax.Array,
    b: jax.Array,
    tile_m: int = 128,
    tile_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(Ma, 32) x (Nb, 32) packed uint8 -> (Ma, Nb) int32 Hamming."""
    ma, nb = a.shape[0], b.shape[0]
    aw = jax.lax.bitcast_convert_type(
        _pad_rows(a, tile_m).reshape(-1, WORDS, 4), jnp.int32
    ).reshape(-1, WORDS)
    bw = jax.lax.bitcast_convert_type(
        _pad_rows(b, tile_n).reshape(-1, WORDS, 4), jnp.int32
    ).reshape(-1, WORDS)
    m_p, n_p = aw.shape[0], bw.shape[0]

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams()

    out = pl.pallas_call(
        _kernel,
        grid=(m_p // tile_m, n_p // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, WORDS), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, WORDS), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(aw, bw)
    return out[:ma, :nb]


def hamming_matrix_packed_best(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA unpack+matmul elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return hamming_matrix_packed_pallas(a, b).astype(jnp.float32)
    from uzliti_slam_tpu.ops import matching
    return matching.hamming_matrix_packed(a, b)
