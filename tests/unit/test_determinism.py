"""Determinism: same input => bit-identical state, across runs and batch
orders where semantics demand it (SURVEY.md §5 "Race detection": the
OR-idempotent Bloom design and deterministic scatter claims replace
sanitizers by construction)."""
import numpy as np
import jax.numpy as jnp

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.pipeline import Pipeline


def _run(reads, seed_cfg=None):
    cfg = Config(size_kmer=21, max_read_length=100, batch_reads=64,
                 estimated_kmers=1 << 14, singletons=1 << 14,
                 junction_capacity=1 << 12, sink_capacity=1 << 13,
                 fp_rate=0.01)
    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)
    return p


def test_rerun_bit_identical(rng):
    genome = simulate.random_genome(rng, 1500)
    reads = simulate.shred(rng, genome, 30, 100, circular=True)
    a = _run(reads)
    b = _run(reads)
    for x, y in ((a.cascade.a_bloom.words, b.cascade.a_bloom.words),
                 (a.cascade.b_bloom.words, b.cascade.b_bloom.words),
                 (a.junctions.keys_hi, b.junctions.keys_hi),
                 (a.junctions.vals[0], b.junctions.vals[0]),
                 (a.junctions.vals[1], b.junctions.vals[1]),
                 (a.sinks.keys_hi, b.sinks.keys_hi),
                 (a.sinks.vals[0], b.sinks.vals[0])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bloom_insert_order_independent(rng):
    """Filter B content is a pure OR: batch order cannot matter."""
    genome = simulate.random_genome(rng, 1500)
    reads = simulate.shred(rng, genome, 30, 100, circular=True)
    # full two-pass load in two different batch orders: final B identical
    # when every k-mer still appears >=2 times in both orders
    a = _run(reads + reads)
    b = _run(list(reversed(reads)) + list(reversed(reads)))
    np.testing.assert_array_equal(np.asarray(a.cascade.b_bloom.words),
                                  np.asarray(b.cascade.b_bloom.words))
