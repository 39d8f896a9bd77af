"""Loop-closure candidate generation as batched Hamming retrieval.

TPU-native re-design of the reference ``place_recognition`` package
(``include/place_recognition/place_recognizer.h:40-106``): the worker-thread
add/search/remove queues become pure functional updates of fixed-capacity
descriptor banks, and every LSH/FLANN index becomes a dense Hamming
reduction on the MXU (exactly the quantity the reference's ``FastLshSet``
hash-voting approximates, ``lsh_set_recognizer.cpp:247-305``).

Three recognizers, mirroring the reference subclasses:

- ``GistBank``        — whole-image binary GIST, k-NN with distance
                        threshold (``binary_gist_recognizer.cpp:39-80``).
- ``FeatureSetBank``  — per-node ORB descriptor sets, similarity = fraction
                        of query descriptors with a close match in the
                        stored node (the default ``lsh`` method in all
                        reference yaml configs).
- ``FeatureRepository`` — incremental unique-descriptor bank with an
                        inverted descriptor→node index
                        (``global_feature_repository.cpp:46-137``).

Shared gates, from ``place_recognizer.cpp``: self-match suppression by
minimum time separation (``:93``, 5 s), k-NN cap (``:96-99``), and
exclusion of already-linked pairs (the pipeline masks pairs that already
have an edge, replacing the ``checked_`` set ``:106-113``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.ops import matching


MIN_TIME_SEPARATION = 5.0  # seconds, reference place_recognizer.cpp:93


# ---------------------------------------------------------------------------
# GIST bank
# ---------------------------------------------------------------------------

class GistBank(NamedTuple):
    desc: jax.Array    # (N, 32) uint8 binary GIST per node slot
    stamp: jax.Array   # (N,)
    valid: jax.Array   # (N,) bool


def gist_bank_init(capacity: int) -> GistBank:
    return GistBank(
        desc=jnp.zeros((capacity, 32), dtype=jnp.uint8),
        stamp=jnp.zeros((capacity,)),
        valid=jnp.zeros((capacity,), dtype=bool),
    )


def gist_bank_add(bank: GistBank, slot: jax.Array, desc: jax.Array,
                  stamp: jax.Array) -> GistBank:
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    return GistBank(
        desc=bank.desc.at[idx].set(jnp.where(ok, desc, bank.desc[idx])),
        stamp=bank.stamp.at[idx].set(jnp.where(ok, stamp, bank.stamp[idx])),
        valid=bank.valid.at[idx].set(jnp.where(ok, True, bank.valid[idx])),
    )


def gist_bank_remove(bank: GistBank, slot: jax.Array) -> GistBank:
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    return bank._replace(valid=bank.valid.at[idx].set(jnp.where(ok, False, bank.valid[idx])))


def gist_query(
    bank: GistBank,
    desc: jax.Array,
    stamp: jax.Array,
    k: int = 10,
    max_dist: float = 60.0,
    min_dt: float = MIN_TIME_SEPARATION,
):
    """Top-k nearest GIST nodes within Hamming ``max_dist`` (the reference's
    ``config_.T``), excluding temporally-adjacent nodes.

    Returns (slots (k,), dists (k,), ok (k,)).
    """
    d = matching.hamming_matrix_packed(desc[None], bank.desc)[0]  # (N,)
    eligible = bank.valid & (jnp.abs(bank.stamp - stamp) >= min_dt)
    d = jnp.where(eligible, d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, k)
    dist = -neg
    return idx, dist, jnp.isfinite(dist) & (dist <= max_dist)


# ---------------------------------------------------------------------------
# Per-node feature-set bank (LSH-set equivalent)
# ---------------------------------------------------------------------------

class FeatureSetBank(NamedTuple):
    desc: jax.Array        # (N, F, 32) uint8 descriptors per node
    desc_valid: jax.Array  # (N, F) bool
    stamp: jax.Array       # (N,)
    valid: jax.Array       # (N,) bool — indexed (enough descriptors)


def feature_bank_init(capacity: int, feats_per_node: int) -> FeatureSetBank:
    return FeatureSetBank(
        desc=jnp.zeros((capacity, feats_per_node, 32), dtype=jnp.uint8),
        desc_valid=jnp.zeros((capacity, feats_per_node), dtype=bool),
        stamp=jnp.zeros((capacity,)),
        valid=jnp.zeros((capacity,), dtype=bool),
    )


def feature_bank_add(
    bank: FeatureSetBank,
    slot: jax.Array,
    desc: jax.Array,
    desc_valid: jax.Array,
    stamp: jax.Array,
    min_descriptors: int = 50,
) -> FeatureSetBank:
    """Index a node's descriptor set. Nodes under ``min_descriptors`` are
    stored but not marked searchable (reference gate: >150 descriptors,
    ``lsh_set_recognizer.cpp:64,112`` — default lowered for small frames)."""
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    enough = jnp.sum(desc_valid) >= min_descriptors
    return FeatureSetBank(
        desc=bank.desc.at[idx].set(jnp.where(ok, desc, bank.desc[idx])),
        desc_valid=bank.desc_valid.at[idx].set(jnp.where(ok, desc_valid, bank.desc_valid[idx])),
        stamp=bank.stamp.at[idx].set(jnp.where(ok, stamp, bank.stamp[idx])),
        valid=bank.valid.at[idx].set(jnp.where(ok, enough, bank.valid[idx])),
    )


def feature_bank_remove(bank: FeatureSetBank, slot: jax.Array) -> FeatureSetBank:
    ok = slot >= 0
    idx = jnp.where(ok, slot, 0)
    return bank._replace(valid=bank.valid.at[idx].set(jnp.where(ok, False, bank.valid[idx])))


def feature_set_query(
    bank: FeatureSetBank,
    desc: jax.Array,
    desc_valid: jax.Array,
    stamp: jax.Array,
    k: int = 10,
    hamming_thresh: float = 40.0,
    min_similarity: float = 0.2,
    min_dt: float = MIN_TIME_SEPARATION,
):
    """Vote-based retrieval: similarity(node) = fraction of query
    descriptors whose nearest descriptor in that node is within
    ``hamming_thresh`` — the dense form of the reference's LSH table voting
    (similarity = matches/#tables, threshold T,
    ``lsh_set_recognizer.cpp:61-89``).

    desc: (F, 32) query descriptors. Returns (slots (k,), sims (k,), ok (k,)).
    """
    n, f = bank.desc.shape[:2]
    qbits = matching.unpack_bits(desc)                       # (F, 256)
    bbits = matching.unpack_bits(bank.desc.reshape(n * f, 32))  # (N*F, 256)
    d = matching.hamming_matrix(qbits, bbits).reshape(-1, n, f)  # (F, N, F)
    d = jnp.where(bank.desc_valid[None], d, jnp.inf)
    dmin = jnp.min(d, axis=-1)                               # (F, N)
    hits = (dmin <= hamming_thresh) & desc_valid[:, None]
    votes = jnp.sum(hits, axis=0)                            # (N,)
    nq = jnp.maximum(jnp.sum(desc_valid), 1)
    sim = votes.astype(jnp.float32) / nq.astype(jnp.float32)

    eligible = bank.valid & (jnp.abs(bank.stamp - stamp) >= min_dt)
    sim = jnp.where(eligible, sim, -1.0)
    top_sim, idx = jax.lax.top_k(sim, k)
    return idx, top_sim, top_sim >= min_similarity


# ---------------------------------------------------------------------------
# Global feature repository (incremental landmark DB)
# ---------------------------------------------------------------------------

class FeatureRepository(NamedTuple):
    desc: jax.Array        # (D, 32) unique descriptors
    desc_valid: jax.Array  # (D,) bool
    links: jax.Array       # (D, L) int32 node slots referencing each descriptor
    link_valid: jax.Array  # (D, L) bool
    num_desc: jax.Array    # () int32
    node_stamp: jax.Array  # (N,) stamps for the time gate
    node_valid: jax.Array  # (N,) bool


def repository_init(desc_capacity: int, links_per_desc: int, node_capacity: int) -> FeatureRepository:
    return FeatureRepository(
        desc=jnp.zeros((desc_capacity, 32), dtype=jnp.uint8),
        desc_valid=jnp.zeros((desc_capacity,), dtype=bool),
        links=jnp.zeros((desc_capacity, links_per_desc), dtype=jnp.int32),
        link_valid=jnp.zeros((desc_capacity, links_per_desc), dtype=bool),
        num_desc=jnp.zeros((), dtype=jnp.int32),
        node_stamp=jnp.zeros((node_capacity,)),
        node_valid=jnp.zeros((node_capacity,), dtype=bool),
    )


def repository_add(
    repo: FeatureRepository,
    node_slot: jax.Array,
    desc: jax.Array,
    desc_valid: jax.Array,
    stamp: jax.Array,
    match_thresh: float = 30.0,
):
    """Insert a node's descriptors: close matches to existing unique
    descriptors only add an inverted-index link; novel descriptors are
    appended (reference ``global_feature_repository.cpp:112-137``).

    Static-shaped: processes all F query slots with masked scatters.
    """
    dcap, lcap = repo.links.shape
    f = desc.shape[0]

    qbits = matching.unpack_bits(desc)
    bbits = matching.unpack_bits(repo.desc)
    d = matching.hamming_matrix(qbits, bbits)        # (F, D)
    d = jnp.where(repo.desc_valid[None, :], d, jnp.inf)
    nn_dist = jnp.min(d, axis=-1)
    nn_idx = jnp.argmin(d, axis=-1)

    is_match = (nn_dist <= match_thresh) & desc_valid
    # near-duplicates WITHIN this frame (repetitive texture) must not each
    # append a fresh "unique" descriptor — keep only the first instance
    d_self = matching.hamming_matrix(qbits, qbits)
    f = desc.shape[0]
    earlier_dup = (
        (d_self <= match_thresh)
        & desc_valid[None, :]
        & (jnp.arange(f)[None, :] < jnp.arange(f)[:, None])
    )
    in_frame_dup = jnp.any(earlier_dup, axis=-1)
    is_new = (~is_match) & desc_valid & ~in_frame_dup

    # Append novel descriptors at sequential slots.
    new_rank = jnp.cumsum(is_new) - 1
    new_slot = repo.num_desc + new_rank.astype(jnp.int32)
    can_append = is_new & (new_slot < dcap)
    target = jnp.where(is_match, nn_idx, jnp.where(can_append, new_slot, 0))
    write_mask = is_match | can_append

    desc_arr = repo.desc.at[jnp.where(can_append, new_slot, dcap)].set(desc, mode="drop")
    dvalid = repo.desc_valid.at[jnp.where(can_append, new_slot, dcap)].set(True, mode="drop")

    # Add inverted-index link at the first free link slot of each target.
    # (scatter with per-row free-slot search, vectorized over F)
    def add_link(links, link_valid, tgt, ok):
        row_valid = link_valid[tgt]                      # (F, L)
        free = jnp.argmin(row_valid, axis=-1)            # first False
        has_free = ~jnp.all(row_valid, axis=-1)
        okk = ok & has_free
        links = links.at[jnp.where(okk, tgt, dcap), jnp.where(okk, free, 0)].set(
            node_slot, mode="drop"
        )
        link_valid = link_valid.at[jnp.where(okk, tgt, dcap), jnp.where(okk, free, 0)].set(
            True, mode="drop"
        )
        return links, link_valid

    # Sequential same-target collisions are rare within one node's features;
    # a single vectorized pass may drop duplicate links (harmless for voting).
    links, link_valid = add_link(repo.links, repo.link_valid, target, write_mask)

    node_stamp = repo.node_stamp.at[node_slot].set(stamp)
    node_valid = repo.node_valid.at[node_slot].set(True)
    return FeatureRepository(
        desc=desc_arr,
        desc_valid=dvalid,
        links=links,
        link_valid=link_valid,
        num_desc=jnp.minimum(repo.num_desc + jnp.sum(can_append), dcap).astype(jnp.int32),
        node_stamp=node_stamp,
        node_valid=node_valid,
    )


def repository_query(
    repo: FeatureRepository,
    desc: jax.Array,
    desc_valid: jax.Array,
    stamp: jax.Array,
    k: int = 10,
    match_thresh: float = 30.0,
    min_votes: int = 5,
    min_dt: float = MIN_TIME_SEPARATION,
):
    """Vote for nodes sharing descriptors with the query set (reference
    ``global_feature_repository.cpp:46-94``). Returns (slots, votes, ok)."""
    n_nodes = repo.node_stamp.shape[0]
    qbits = matching.unpack_bits(desc)
    bbits = matching.unpack_bits(repo.desc)
    d = matching.hamming_matrix(qbits, bbits)
    d = jnp.where(repo.desc_valid[None, :], d, jnp.inf)
    hit = (d <= match_thresh) & desc_valid[:, None]      # (F, D)
    desc_hit = jnp.any(hit, axis=0)                      # (D,)

    # votes[node] = number of hit descriptors linking to node
    contrib = (desc_hit[:, None] & repo.link_valid).astype(jnp.int32)  # (D, L)
    votes = jax.ops.segment_sum(
        contrib.reshape(-1),
        jnp.where(repo.link_valid, repo.links, n_nodes).reshape(-1),
        num_segments=n_nodes + 1,
    )[:n_nodes]

    eligible = repo.node_valid & (jnp.abs(repo.node_stamp - stamp) >= min_dt)
    votes = jnp.where(eligible, votes, -1)
    top_votes, idx = jax.lax.top_k(votes, k)
    return idx, top_votes, top_votes >= min_votes


# ---------------------------------------------------------------------------
# Pair gating shared with the pipeline
# ---------------------------------------------------------------------------

def mask_existing_pairs(e_from, e_to, e_valid, cand_a, cand_b):
    """Drop candidate (a, b) pairs already connected by an edge — the
    batched replacement for the reference's ``checked_`` pair set
    (``place_recognizer.cpp:106-113``)."""
    pa = jnp.minimum(cand_a, cand_b)
    pb = jnp.maximum(cand_a, cand_b)
    ea = jnp.minimum(e_from, e_to)
    eb = jnp.maximum(e_from, e_to)
    dup = (pa[:, None] == ea[None, :]) & (pb[:, None] == eb[None, :]) & e_valid[None, :]
    return ~jnp.any(dup, axis=-1)
