"""Fused cascade kernel (kernels/cascade.py) vs the XLA reference path.

The kernel's sequential in-VMEM semantics must produce bit-identical
filters to core/bloom.cascade_insert's sort+count formulation (the two
are provably equivalent: a k-mer's c-th in-batch occurrence sees A primed
by occurrence c-1). Runs in Pallas interpret mode on the CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core.hashing import hash_pair
from faucet_tpu.kernels.cascade import SENTINEL, cascade_insert_fused


def _blocks(khi, klo, la, lb, mask, shard_bits=0):
    block_a, h1r, h2 = BL._block_h1r_h2(khi, klo, la, shard_bits)
    block_b, _, _ = BL._block_h1r_h2(khi, klo, lb, shard_bits)
    block_a = jnp.where(mask, block_a, SENTINEL)
    return block_a, block_b, h1r, h2


@pytest.mark.parametrize("la,lb,n,dup", [(18, 16, 500, False),
                                         (20, 17, 2000, True),
                                         (23, 20, 4096, True)])
def test_fused_matches_reference(rng, la, lb, n, dup):
    cfg = Config(size_kmer=31, max_read_length=64,
                 bloom_a_log2_override=la, bloom_b_log2_override=lb)
    khi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    if dup:  # force in-batch duplicates incl. triples
        khi[n // 2:] = khi[: n - n // 2]
        klo[n // 2:] = klo[: n - n // 2]
        khi[-n // 4:] = khi[: n // 4]
        klo[-n // 4:] = klo[: n // 4]
    mask = rng.random(n) < 0.9

    # reference path (cfg.exact False, CPU -> XLA sort+count formulation)
    c0 = BL.make_cascade(cfg)
    ref = BL.cascade_insert(c0, jnp.asarray(khi), jnp.asarray(klo),
                            jnp.asarray(mask), cfg)
    # second batch to exercise cross-batch A state
    ref = BL.cascade_insert(ref, jnp.asarray(khi[::-1].copy()),
                            jnp.asarray(klo[::-1].copy()),
                            jnp.asarray(mask[::-1].copy()), cfg)

    ba, bb, h1r, h2 = _blocks(jnp.asarray(khi), jnp.asarray(klo), la, lb,
                              jnp.asarray(mask))
    aw, bw, nb1 = cascade_insert_fused(c0.a_bloom.words, c0.b_bloom.words,
                                  ba, bb, h1r, h2, cfg.n_hash_a, cfg.n_hash_b,
                                  interpret=True)
    # new-B flags: the kernel flags the promoting occurrence, the XLA
    # path flags the representative lane — the flagged KEY SETS and
    # per-key flag counts must agree
    _, nb_ref = BL.cascade_insert_nb(c0, jnp.asarray(khi),
                                     jnp.asarray(klo), jnp.asarray(mask),
                                     cfg)
    def key_multiset(flags):
        f = np.asarray(flags)
        return sorted(zip(khi[f].tolist(), klo[f].tolist()))
    assert key_multiset(nb1) == key_multiset(nb_ref)
    # per-lane window solidity (bit1 of the packed flags) must match the
    # fallback's at-its-turn rule EXACTLY — the streaming scan consumes
    # it as the window probe
    aw_s, bw_s, nb_s, sol_s = cascade_insert_fused(
        c0.a_bloom.words, c0.b_bloom.words, ba, bb, h1r, h2,
        cfg.n_hash_a, cfg.n_hash_b, with_solid=True, interpret=True)
    _, nb_f, sol_f = BL.cascade_insert_nbs(c0, jnp.asarray(khi),
                                           jnp.asarray(klo),
                                           jnp.asarray(mask), cfg)
    ss, sf = np.asarray(sol_s), np.asarray(sol_f)
    # the kernel probes B at each key's own turn (mid-batch state), the
    # fallback pre-batch: the kernel's set is a SUPERSET, and the extras
    # are Bloom-fp-level noise on fresh keys only
    assert not (sf & ~ss).any()
    assert (ss & ~sf).mean() < 0.03
    np.testing.assert_array_equal(np.asarray(aw_s), np.asarray(aw))
    np.testing.assert_array_equal(np.asarray(bw_s), np.asarray(bw))
    ba2, bb2, h1r2, h22 = _blocks(jnp.asarray(khi[::-1].copy()),
                                  jnp.asarray(klo[::-1].copy()), la, lb,
                                  jnp.asarray(mask[::-1].copy()))
    aw, bw, _nb = cascade_insert_fused(aw, bw, ba2, bb2, h1r2, h22, cfg.n_hash_a, cfg.n_hash_b,
                                  interpret=True)

    np.testing.assert_array_equal(np.asarray(aw),
                                  np.asarray(ref.a_bloom.words))
    np.testing.assert_array_equal(np.asarray(bw),
                                  np.asarray(ref.b_bloom.words))


def test_fused_sharded_addressing(rng):
    """Owner-prefixed addressing (shard_bits>0) must slice per shard."""
    cfg = Config(size_kmer=31, max_read_length=64, n_shards=4,
                 bloom_a_log2_override=20, bloom_b_log2_override=17)
    n = 1024
    khi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    mask = np.ones(n, bool)
    c0 = BL.make_cascade(cfg)
    ref = BL.cascade_insert(c0, jnp.asarray(khi), jnp.asarray(klo),
                            jnp.asarray(mask), cfg)
    ba, bb, h1r, h2 = _blocks(jnp.asarray(khi), jnp.asarray(klo), 20, 17,
                              jnp.asarray(mask), shard_bits=2)
    aw, bw, _nb = cascade_insert_fused(c0.a_bloom.words, c0.b_bloom.words,
                                  ba, bb, h1r, h2, cfg.n_hash_a, cfg.n_hash_b,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(aw),
                                  np.asarray(ref.a_bloom.words))
    np.testing.assert_array_equal(np.asarray(bw),
                                  np.asarray(ref.b_bloom.words))


def test_fused_empty_and_all_masked(rng):
    cfg = Config(size_kmer=31, max_read_length=64,
                 bloom_a_log2_override=18, bloom_b_log2_override=16)
    c0 = BL.make_cascade(cfg)
    n = 64
    khi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    mask = np.zeros(n, bool)
    ba, bb, h1r, h2 = _blocks(jnp.asarray(khi), jnp.asarray(klo), 18, 16,
                              jnp.asarray(mask))
    aw, bw, _nb = cascade_insert_fused(c0.a_bloom.words, c0.b_bloom.words,
                                  ba, bb, h1r, h2, cfg.n_hash_a, cfg.n_hash_b,
                                  interpret=True)
    assert np.asarray(aw).sum() == 0
    assert np.asarray(bw).sum() == 0


def test_sparse_matches_dense(rng):
    """The 32-lane word-skip variant must produce the same filters as the
    dense kernel for a mostly-False mask (the node-insert call shape)."""
    cfg = Config(size_kmer=31, max_read_length=64,
                 bloom_a_log2_override=20, bloom_b_log2_override=17)
    n = 4096
    khi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    mask = rng.random(n) < 0.03
    c0 = BL.make_cascade(cfg)
    ba, bb, h1r, h2 = _blocks(jnp.asarray(khi), jnp.asarray(klo), 20, 17,
                              jnp.asarray(mask))
    aw_d, bw_d, nb_d = cascade_insert_fused(
        c0.a_bloom.words, c0.b_bloom.words, ba, bb, h1r, h2,
        cfg.n_hash_a, cfg.n_hash_b, interpret=True)
    aw_s, bw_s, nb_s = cascade_insert_fused(
        c0.a_bloom.words, c0.b_bloom.words, ba, bb, h1r, h2,
        cfg.n_hash_a, cfg.n_hash_b, live=jnp.asarray(mask), sparse=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(aw_s), np.asarray(aw_d))
    np.testing.assert_array_equal(np.asarray(bw_s), np.asarray(bw_d))
    np.testing.assert_array_equal(np.asarray(nb_s), np.asarray(nb_d))


def test_prefilter_path_bit_identical(rng):
    """The already-in-B pre-filter (core/bloom.cascade_insert_nb TPU
    path) must leave filters AND new_b flags bit-identical to dense
    processing: a key in B is a complete cascade no-op."""
    from faucet_tpu.kernels.probe import bloom_probe_keys

    cfg = Config(size_kmer=31, max_read_length=64,
                 bloom_a_log2_override=20, bloom_b_log2_override=17)
    n = 2048
    khi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    mask = jnp.asarray(rng.random(n) < 0.95)
    c0 = BL.make_cascade(cfg)
    ba, bb, h1r, h2 = _blocks(jnp.asarray(khi), jnp.asarray(klo), 20, 17,
                              mask)
    # two dense rounds: most keys end up solid (in B)
    aw, bw, _ = cascade_insert_fused(c0.a_bloom.words, c0.b_bloom.words,
                                     ba, bb, h1r, h2, cfg.n_hash_a,
                                     cfg.n_hash_b, interpret=True)
    aw, bw, _ = cascade_insert_fused(aw, bw, ba, bb, h1r, h2,
                                     cfg.n_hash_a, cfg.n_hash_b,
                                     interpret=True)
    # third round, dense vs prefiltered-sparse: must match exactly
    aw_d, bw_d, nb_d = cascade_insert_fused(aw, bw, ba, bb, h1r, h2,
                                            cfg.n_hash_a, cfg.n_hash_b,
                                            interpret=True)
    in_b = bloom_probe_keys(bw, jnp.where(mask, bb, SENTINEL), h1r, h2,
                            cfg.n_hash_b, interpret=True)
    live = mask & ~in_b
    ba_l = jnp.where(live, BL._block_h1r_h2(jnp.asarray(khi),
                                            jnp.asarray(klo), 20)[0],
                     SENTINEL)
    aw_s, bw_s, nb_s = cascade_insert_fused(aw, bw, ba_l, bb, h1r, h2,
                                            cfg.n_hash_a, cfg.n_hash_b,
                                            live=live, sparse=True,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(aw_s), np.asarray(aw_d))
    np.testing.assert_array_equal(np.asarray(bw_s), np.asarray(bw_d))
    np.testing.assert_array_equal(np.asarray(nb_s), np.asarray(nb_d))
