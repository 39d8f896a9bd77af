"""Binary BoW vocabulary: k-majority training, tf-idf quantization,
L1-score retrieval (DBoW2 / generate_bow_vocabulary analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.ops import matching
from uzliti_slam_tpu.recognition import vocabulary as voc


def _clustered_descriptors(key, n_clusters, per_cluster, flip_bits=8):
    """Random cluster prototypes + noisy members (few flipped bits)."""
    kc, kf = jax.random.split(key)
    protos = jax.random.randint(kc, (n_clusters, 32), 0, 256, dtype=jnp.int32)
    protos = protos.astype(jnp.uint8)
    bits = matching.unpack_bits(jnp.repeat(protos, per_cluster, axis=0))
    m = bits.shape[0]
    flip_idx = jax.random.randint(kf, (m, flip_bits), 0, 256)
    flip = jnp.zeros_like(bits).at[jnp.arange(m)[:, None], flip_idx].set(1.0)
    noisy = jnp.abs(bits - flip)
    return matching.pack_bits(noisy), protos


def test_kmajority_recovers_clusters():
    desc, protos = _clustered_descriptors(jax.random.PRNGKey(0), 8, 32)
    v = voc.build_vocabulary(jax.random.PRNGKey(1), desc, k=8, iterations=10)
    # every prototype should have a vocabulary word within a few bits
    d = np.asarray(matching.hamming_matrix_packed(protos, v.centers))
    assert (d.min(axis=1) <= 6).all()


def test_quantize_normalized_and_idf():
    desc, _ = _clustered_descriptors(jax.random.PRNGKey(2), 4, 16)
    v = voc.build_vocabulary(jax.random.PRNGKey(3), desc, k=16, iterations=6)
    vec = voc.quantize(v, desc[:32])
    assert float(jnp.sum(jnp.abs(vec))) == pytest.approx(1.0, abs=1e-5)
    assert vec.shape == (16,)
    # rare words weigh more: idf positive for unused words, low for common
    assert np.asarray(v.idf).max() > np.asarray(v.idf).min()


def test_bow_retrieval_ranks_same_place_first():
    key = jax.random.PRNGKey(4)
    desc, _ = _clustered_descriptors(key, 16, 16)  # 256 descriptors
    v = voc.build_vocabulary(jax.random.PRNGKey(5), desc, k=32, iterations=6)

    # three "places", each seen twice with disjoint descriptor halves
    places = [desc[i * 80:(i + 1) * 80] for i in range(3)]
    bank = voc.bow_bank_init(8, 32)
    for i, p in enumerate(places):
        bank = voc.bow_bank_add(
            bank, jnp.asarray(i), voc.quantize(v, p[:40]), jnp.asarray(10.0 * i)
        )
    # query with the OTHER half of place 1, far in time
    q = voc.quantize(v, places[1][40:])
    slots, scores, ok = voc.bow_query(bank, q, jnp.asarray(100.0), k=3)
    assert int(slots[0]) == 1
    assert bool(ok[0])
    assert float(scores[0]) > float(scores[1])


def test_time_gate_and_remove():
    desc, _ = _clustered_descriptors(jax.random.PRNGKey(6), 4, 16)
    v = voc.build_vocabulary(jax.random.PRNGKey(7), desc, k=16, iterations=4)
    vec = voc.quantize(v, desc[:16])
    bank = voc.bow_bank_init(4, 16)
    bank = voc.bow_bank_add(bank, jnp.asarray(0), vec, jnp.asarray(0.0))
    # same descriptor but within the 5 s separation window -> suppressed
    _, _, ok = voc.bow_query(bank, vec, jnp.asarray(2.0), k=2)
    assert not bool(ok[0])
    _, _, ok = voc.bow_query(bank, vec, jnp.asarray(20.0), k=2)
    assert bool(ok[0])
    bank = voc.bow_bank_remove(bank, jnp.asarray(0))
    _, _, ok = voc.bow_query(bank, vec, jnp.asarray(20.0), k=2)
    assert not bool(ok[0])


def test_jit_and_empty_cluster_stability():
    desc, _ = _clustered_descriptors(jax.random.PRNGKey(8), 2, 8)
    # k larger than distinct clusters -> empty clusters must keep centers
    build = jax.jit(lambda kk, d: voc.build_vocabulary(kk, d, k=12, iterations=5))
    v = build(jax.random.PRNGKey(9), desc)
    assert np.isfinite(np.asarray(v.idf)).all()
    vec = voc.quantize(v, desc)
    assert np.isfinite(np.asarray(vec)).all()
