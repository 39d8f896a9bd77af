"""Binary bag-of-words vocabulary: builder + BoW retrieval bank.

TPU-native counterpart of the reference's DBoW2 path — the offline
vocabulary generator tool (``graph_slam_common/src/generate_bow_vocabulary.
cpp``) and the ``BinaryBowRecognizer`` (``graph_slam_common/src/pr/
binary_bow_recognizer.cpp:30-67``). DBoW2 builds a hierarchical k-medians
tree over ORB descriptors with majority-bit cluster centers; here the
vocabulary is a FLAT k-majority codebook (one Hamming-matmul quantization
step on the MXU replaces the tree descent — the tree only exists to make
CPU lookup sub-linear) and retrieval is the standard L1 BoW score over
tf-idf vectors, as DBoW2's ``BowVector::score`` does.

Everything is static-shape jax: build = ``lax.scan`` of (assign via int8
Hamming matmul → majority-bit update); empty clusters keep their previous
center.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import matching


class Vocabulary(NamedTuple):
    centers: jax.Array  # (K, 32) uint8 packed binary words
    idf: jax.Array      # (K,) float32 inverse-document-frequency weights


def build_vocabulary(
    key: jax.Array,
    desc: jax.Array,
    valid: jax.Array | None = None,
    k: int = 256,
    iterations: int = 8,
) -> Vocabulary:
    """k-majority clustering of binary descriptors (the binary k-means of
    DBoW2's vocabulary training, flat instead of hierarchical).

    desc: (M, 32) uint8 training descriptors; valid: (M,) mask.
    """
    m = desc.shape[0]
    if valid is None:
        valid = jnp.ones((m,), dtype=bool)
    bits = matching.unpack_bits(desc)  # (M, 256) f32 {0,1}
    wbit = bits * valid[:, None]

    # init: farthest-point (k-center) seeding — one seed per natural cluster,
    # immune to the duplicated-seed local optimum of uniform sampling
    p = valid.astype(jnp.float32)
    idx0 = jax.random.choice(key, m, p=p / jnp.maximum(jnp.sum(p), 1.0))

    def pick(carry, _):
        mindist, last = carry
        d = jnp.sum(jnp.abs(bits - bits[last][None]), axis=-1)
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(jnp.where(valid, mindist, -1.0))
        return (mindist, nxt), last

    (_, _), chosen = jax.lax.scan(
        pick, (jnp.full((m,), jnp.inf), idx0), None, length=k
    )
    centers = bits[chosen]  # (K, 256)

    def step(centers, _):
        d = matching.hamming_matrix(bits, centers)           # (M, K)
        d = jnp.where(valid[:, None], d, jnp.inf)
        assign = jnp.argmin(d, axis=-1)                      # (M,)
        dmin = jnp.min(d, axis=-1)
        seg = jnp.where(valid, assign, k)
        sums = jax.ops.segment_sum(wbit, seg, num_segments=k + 1)[:k]  # (K, 256)
        counts = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=k + 1
        )[:k]
        new = (sums > 0.5 * counts[:, None]).astype(jnp.float32)
        # empty clusters reseed with the points farthest from their current
        # centers (splits over-seeded clusters instead of going dead)
        empty = counts == 0
        order = jnp.argsort(-jnp.where(valid & jnp.isfinite(dmin), dmin, -jnp.inf))
        rank = jnp.clip(jnp.cumsum(empty) - 1, 0, m - 1)
        reseed = bits[order[rank]]
        return jnp.where(empty[:, None], reseed, new), None

    centers, _ = jax.lax.scan(step, centers, None, length=iterations)

    # idf over the training set: log(M / (1 + n_word))
    d = matching.hamming_matrix(bits, centers)
    assign = jnp.argmin(jnp.where(valid[:, None], d, jnp.inf), axis=-1)
    n_word = jax.ops.segment_sum(
        valid.astype(jnp.float32), jnp.where(valid, assign, k), num_segments=k + 1
    )[:k]
    n_total = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    idf = jnp.log(n_total / (1.0 + n_word))
    return Vocabulary(centers=matching.pack_bits(centers), idf=idf)


def quantize(
    vocab: Vocabulary, desc: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Descriptor set (F, 32) -> L1-normalized tf-idf BoW vector (K,)."""
    f = desc.shape[0]
    if valid is None:
        valid = jnp.ones((f,), dtype=bool)
    k = vocab.centers.shape[0]
    d = matching.hamming_matrix_packed(desc, vocab.centers)  # (F, K)
    word = jnp.argmin(d, axis=-1)
    tf = jax.ops.segment_sum(
        valid.astype(jnp.float32), jnp.where(valid, word, k), num_segments=k + 1
    )[:k]
    v = tf * jnp.maximum(vocab.idf, 0.0)
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)


def bow_score(va: jax.Array, vb: jax.Array) -> jax.Array:
    """DBoW2 L1 score in [0, 1]: 1 - 0.5 * ||va - vb||_1 for L1-normalized
    vectors (``DBoW2::L1Scoring``). Broadcasts over leading axes."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(va - vb), axis=-1)


# ---------------------------------------------------------------------------
# BoW retrieval bank (BinaryBowRecognizer analog)
# ---------------------------------------------------------------------------

class BowBank(NamedTuple):
    vec: jax.Array    # (N, K) L1-normalized tf-idf vectors per node slot
    stamp: jax.Array  # (N,)
    valid: jax.Array  # (N,) bool


def bow_bank_init(capacity: int, k_words: int) -> BowBank:
    return BowBank(
        vec=jnp.zeros((capacity, k_words), dtype=jnp.float32),
        stamp=jnp.zeros((capacity,)),
        valid=jnp.zeros((capacity,), dtype=bool),
    )


def bow_bank_add(
    bank: BowBank, slot: jax.Array, vec: jax.Array, stamp: jax.Array
) -> BowBank:
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    return BowBank(
        vec=bank.vec.at[idx].set(jnp.where(ok, vec, bank.vec[idx])),
        stamp=bank.stamp.at[idx].set(jnp.where(ok, stamp, bank.stamp[idx])),
        valid=bank.valid.at[idx].set(jnp.where(ok, True, bank.valid[idx])),
    )


def bow_bank_remove(bank: BowBank, slot: jax.Array) -> BowBank:
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    return bank._replace(
        valid=bank.valid.at[idx].set(jnp.where(ok, False, bank.valid[idx]))
    )


def bow_query(
    bank: BowBank,
    vec: jax.Array,
    stamp: jax.Array,
    k: int = 10,
    min_score: float = 0.05,
    min_dt: float = 5.0,
):
    """Top-k nodes by L1 BoW score (``binary_bow_recognizer.cpp:30-67``:
    DBoW2 database query with score threshold), with the shared
    time-separation gate. Returns (slots, scores, ok)."""
    s = bow_score(bank.vec, vec[None])  # (N,)
    # zero tf-idf vectors (no valid descriptors, or all words idf<=0) score
    # 1.0 against each other under the L1 formula — featureless frames must
    # never rank as top loop-closure candidates, so both sides must be
    # non-degenerate
    nonzero = jnp.sum(jnp.abs(bank.vec), axis=-1) > 1e-9
    q_nonzero = jnp.sum(jnp.abs(vec)) > 1e-9
    eligible = (
        bank.valid & nonzero & q_nonzero
        & (jnp.abs(bank.stamp - stamp) >= min_dt)
    )
    s = jnp.where(eligible, s, -1.0)
    top, idx = jax.lax.top_k(s, k)
    return idx, top, top >= min_score
