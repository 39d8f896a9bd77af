"""Place-recognition tests (SURVEY.md §7 phase 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from uzliti_slam_tpu.recognition import recognizer as rec

KEY = jax.random.PRNGKey(0)


def rand_desc(key, shape):
    return jax.random.randint(key, shape + (32,), 0, 256, dtype=jnp.int32).astype(jnp.uint8)


def perturb(key, desc, n_bits=5):
    """Flip n_bits random bits in each descriptor."""
    bits = np.unpackbits(np.asarray(desc), axis=-1)
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    flat = bits.reshape(-1, 256)
    for i in range(flat.shape[0]):
        pos = rng.choice(256, n_bits, replace=False)
        flat[i, pos] ^= 1
    return jnp.asarray(np.packbits(flat.reshape(bits.shape), axis=-1))


class TestGistBank:
    def test_finds_similar_scene(self):
        bank = rec.gist_bank_init(64)
        descs = rand_desc(KEY, (20,))
        for i in range(20):
            bank = rec.gist_bank_add(bank, jnp.asarray(i), descs[i], jnp.asarray(i * 1.0))
        # query = noisy copy of node 7, at a much later time
        q = perturb(jax.random.PRNGKey(1), descs[7:8], 8)[0]
        slots, dists, ok = rec.gist_query(bank, q, jnp.asarray(100.0), k=5, max_dist=30.0)
        assert bool(ok[0])
        assert int(slots[0]) == 7
        assert float(dists[0]) <= 10

    def test_time_gate(self):
        bank = rec.gist_bank_init(16)
        d = rand_desc(KEY, (1,))[0]
        bank = rec.gist_bank_add(bank, jnp.asarray(0), d, jnp.asarray(10.0))
        # same descriptor 2 s later: suppressed
        _, _, ok = rec.gist_query(bank, d, jnp.asarray(12.0), k=3)
        assert not bool(ok.any())
        # 10 s later: found
        slots, _, ok = rec.gist_query(bank, d, jnp.asarray(20.0), k=3)
        assert bool(ok[0]) and int(slots[0]) == 0

    def test_remove(self):
        bank = rec.gist_bank_init(16)
        d = rand_desc(KEY, (1,))[0]
        bank = rec.gist_bank_add(bank, jnp.asarray(0), d, jnp.asarray(0.0))
        bank = rec.gist_bank_remove(bank, jnp.asarray(0))
        _, _, ok = rec.gist_query(bank, d, jnp.asarray(100.0), k=3)
        assert not bool(ok.any())


class TestFeatureSetBank:
    def test_revisit_detection(self):
        F = 32
        bank = rec.feature_bank_init(16, F)
        scenes = rand_desc(KEY, (5, F))
        for i in range(5):
            bank = rec.feature_bank_add(
                bank, jnp.asarray(i), scenes[i], jnp.ones(F, bool),
                jnp.asarray(i * 1.0), min_descriptors=10,
            )
        q = perturb(jax.random.PRNGKey(2), scenes[3], 4)
        slots, sims, ok = rec.feature_set_query(
            bank, q, jnp.ones(F, bool), jnp.asarray(50.0),
            k=3, hamming_thresh=20.0, min_similarity=0.5,
        )
        assert bool(ok[0])
        assert int(slots[0]) == 3
        assert float(sims[0]) > 0.9

    def test_min_descriptor_gate(self):
        F = 32
        bank = rec.feature_bank_init(8, F)
        d = rand_desc(KEY, (F,))
        dv = jnp.zeros(F, bool).at[:5].set(True)  # only 5 valid
        bank = rec.feature_bank_add(bank, jnp.asarray(0), d, dv, jnp.asarray(0.0), min_descriptors=10)
        slots, sims, ok = rec.feature_set_query(
            bank, d, dv, jnp.asarray(100.0), k=3, hamming_thresh=20.0, min_similarity=0.1,
        )
        assert not bool(ok.any())  # node not searchable

    def test_unrelated_scene_low_similarity(self):
        F = 32
        bank = rec.feature_bank_init(8, F)
        bank = rec.feature_bank_add(
            bank, jnp.asarray(0), rand_desc(KEY, (F,)), jnp.ones(F, bool),
            jnp.asarray(0.0), min_descriptors=10,
        )
        q = rand_desc(jax.random.PRNGKey(5), (F,))
        _, sims, ok = rec.feature_set_query(
            bank, q, jnp.ones(F, bool), jnp.asarray(100.0),
            k=3, hamming_thresh=20.0, min_similarity=0.3,
        )
        assert not bool(ok.any())


class TestRepository:
    def test_dedup_and_voting(self):
        F = 16
        repo = rec.repository_init(256, 4, 32)
        shared = rand_desc(KEY, (F,))
        # node 0 and node 1 observe the same descriptors
        repo = rec.repository_add(repo, jnp.asarray(0), shared, jnp.ones(F, bool), jnp.asarray(0.0))
        n_after_first = int(repo.num_desc)
        repo = rec.repository_add(repo, jnp.asarray(1), shared, jnp.ones(F, bool), jnp.asarray(1.0))
        # repeats only linked, not re-appended (reference :75-82)
        assert int(repo.num_desc) == n_after_first == F

        slots, votes, ok = rec.repository_query(
            repo, shared, jnp.ones(F, bool), jnp.asarray(100.0), k=3, min_votes=5,
        )
        got = set(np.asarray(slots)[np.asarray(ok)].tolist())
        assert {0, 1} <= got

    def test_novel_descriptors_appended(self):
        F = 8
        repo = rec.repository_init(64, 4, 8)
        repo = rec.repository_add(repo, jnp.asarray(0), rand_desc(KEY, (F,)), jnp.ones(F, bool), jnp.asarray(0.0))
        repo = rec.repository_add(repo, jnp.asarray(1), rand_desc(jax.random.PRNGKey(7), (F,)), jnp.ones(F, bool), jnp.asarray(1.0))
        assert int(repo.num_desc) == 2 * F

    def test_no_false_positive(self):
        F = 8
        repo = rec.repository_init(64, 4, 8)
        repo = rec.repository_add(repo, jnp.asarray(0), rand_desc(KEY, (F,)), jnp.ones(F, bool), jnp.asarray(0.0))
        q = rand_desc(jax.random.PRNGKey(8), (F,))
        _, votes, ok = rec.repository_query(repo, q, jnp.ones(F, bool), jnp.asarray(100.0), k=3, min_votes=2)
        assert not bool(ok.any())


class TestPairMask:
    def test_masks_existing(self):
        e_from = jnp.array([0, 2, 5], dtype=jnp.int32)
        e_to = jnp.array([1, 3, 6], dtype=jnp.int32)
        e_valid = jnp.array([True, True, False])
        ca = jnp.array([1, 3, 5, 7], dtype=jnp.int32)
        cb = jnp.array([0, 2, 6, 8], dtype=jnp.int32)
        keep = np.asarray(rec.mask_existing_pairs(e_from, e_to, e_valid, ca, cb))
        # (1,0) exists (reversed), (3,2) exists, (5,6) exists but invalid, (7,8) new
        np.testing.assert_array_equal(keep, [False, False, True, True])
