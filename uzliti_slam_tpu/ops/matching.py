"""Binary-descriptor matching as MXU matmuls.

Replaces the reference's brute-force ``cv::BFMatcher`` Hamming 2-NN loop
(``transformation_estimation/src/feature_transformation_estimator.cpp:58-71``)
with one batched popcount-as-matmul: for bit-unpacked descriptors
a, b ∈ {0,1}, Hamming(a, b) = |a| + |b| - 2·a·bᵀ — a single (F×D)·(D×F)
contraction that XLA tiles straight onto the MXU.

This is THE Hamming entry point. A packed-word VPU popcount Pallas kernel
was A/B-benchmarked against it on-chip at the pipeline shapes and LOST at
every bandwidth/compute-bound shape, so it was removed (r2 measurements,
one real TPU chip, packed (M,32)x(N,32) uint8 inputs):

  shape          MXU matmul   Pallas popcount
  300 x 300        1.92 ms      1.57 ms   (both dispatch-bound over the
                                           remote tunnel; inside a fused
                                           jitted pipeline no dispatch
                                           occurs, so this "win" is noise)
  128 x 131072     1.59 ms      9.00 ms   (place-recognition retrieval)
  300 x 38400      1.60 ms      8.07 ms   (repository retrieval)
  4096 x 4096      1.42 ms      8.95 ms   (vocabulary build)

The unpack adds 8x VMEM traffic in theory, but XLA fuses it into the
matmul's LHS/RHS loads and the MXU's 256-wide int8 MACs beat the VPU's
32-lane popcount+reduce by ~6x — matching the r1 measurement (2.9 T
bit-ops/s at 4096²).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ORB/BRIEF descriptors: 32 bytes = 256 bits (reference AORB output).
DESCRIPTOR_BYTES = 32
DESCRIPTOR_BITS = DESCRIPTOR_BYTES * 8


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(..., B) uint8 -> (..., 8*B) float32 bits in {0, 1} (LSB first)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(jnp.float32)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(..., 8*B) {0,1} -> (..., B) uint8 (LSB first)."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint8)


def hamming_matrix(bits_a: jax.Array, bits_b: jax.Array) -> jax.Array:
    """Pairwise Hamming distances from bit-unpacked descriptors.

    bits_a: (Na, D), bits_b: (Nb, D) in {0,1}. Returns (Na, Nb) float32.
    The contraction runs as an int8 matmul with int32 accumulation — the
    fastest path on the v5e MXU (measured 2.9 T bit-ops/s at 4096², ~1.15x
    over bf16 and ~6x over a VPU popcount Pallas kernel) and exact
    everywhere.
    """
    a8 = bits_a.astype(jnp.int8)
    b8 = bits_b.astype(jnp.int8)
    na = jnp.sum(a8.astype(jnp.int32), axis=-1, keepdims=True)
    nb = jnp.sum(b8.astype(jnp.int32), axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        a8,
        b8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (na + nb.T - 2 * cross).astype(jnp.float32)


def hamming_matrix_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise Hamming distances from packed uint8 descriptors."""
    return hamming_matrix(unpack_bits(a), unpack_bits(b))


def knn_match(
    dist: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
    k: int = 2,
):
    """k smallest distances per row. Returns (dists (Na,k), idx (Na,k)).

    Invalid rows/cols are pushed to +inf so padded descriptor slots never
    match.
    """
    big = jnp.float32(1e9)
    if valid_b is not None:
        dist = jnp.where(valid_b[None, :], dist, big)
    if valid_a is not None:
        dist = jnp.where(valid_a[:, None], dist, big)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


def ratio_test(
    d: jax.Array, idx: jax.Array, ratio: float = 0.99, max_dist: float | None = None
):
    """Lowe ratio test on 2-NN results (reference ratio 0.99,
    ``feature_transformation_estimator.cpp:65-71``).

    Returns (match_idx (Na,), ok (Na,) bool): best-neighbor index per query
    and acceptance mask.
    """
    best, second = d[:, 0], d[:, 1]
    ok = best <= ratio * second
    if max_dist is not None:
        ok &= best <= max_dist
    return idx[:, 0], ok


def match_descriptors(
    bits_a: jax.Array,
    bits_b: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
    ratio: float = 0.99,
    max_dist: float | None = None,
):
    """Full matching pipeline: Hamming matmul → 2-NN → ratio test.

    Returns (match_idx, ok, best_dist) each shaped (Na,).
    """
    dm = hamming_matrix(bits_a, bits_b)
    d, idx = knn_match(dm, valid_a, valid_b, k=2)
    mi, ok = ratio_test(d, idx, ratio, max_dist)
    if valid_a is not None:
        ok &= valid_a
    return mi, ok, d[:, 0]


def l2_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise squared-L2 distances between float descriptors.

    a: (Na, D), b: (Nb, D) float32. One (Na×D)·(D×Nb) MXU contraction:
    ‖a−b‖² = ‖a‖² + ‖b‖² − 2·a·bᵀ — the float-descriptor norm the
    reference's BFMatcher uses for SURF/SIFT types
    (``feature_extraction_core.cpp:51-85`` descriptor factory,
    ``Features.msg`` enums SURF=5 / SIFT=6). Clamped at 0 (cancellation).
    """
    na = jnp.sum(a * a, axis=-1, keepdims=True)
    nb = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(na + nb.T - 2.0 * cross, 0.0)


def match_descriptors_l2(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
    ratio: float = 0.8,
    max_dist: float | None = None,
):
    """Float-descriptor matching: squared-L2 matmul → 2-NN → ratio test.

    The ratio applies to EUCLIDEAN distance (Lowe's 0.8 convention), so it
    is squared before comparing against the squared-distance 2-NN results.
    Returns (match_idx, ok, best_sqdist) each shaped (Na,).
    """
    dm = l2_matrix(desc_a, desc_b)
    d, idx = knn_match(dm, valid_a, valid_b, k=2)
    mi, ok = ratio_test(d, idx, ratio * ratio,
                        None if max_dist is None else max_dist * max_dist)
    if valid_a is not None:
        ok &= valid_a
    return mi, ok, d[:, 0]
