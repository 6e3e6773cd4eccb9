"""Bloom + cascade tests (SURVEY.md §4: no-false-negatives, measured FP
rate vs theory, cascade solidity semantics vs the golden refimpl)."""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL


def _keys(rng, n):
    return (jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                        .astype(np.uint32)))


def test_bloom_no_false_negatives(rng):
    log2 = 16
    nh = 5
    b = BL.make_bloom(log2)
    hi, lo = _keys(rng, 2000)
    b = BL.bloom_insert(b, hi, lo, jnp.ones(2000, bool), nh, log2)
    got = BL.bloom_contains(b, hi, lo, jnp.ones(2000, bool), nh, log2)
    assert bool(jnp.all(got))


def test_bloom_fp_rate_near_theory(rng):
    log2 = 14  # 16384 bits
    nh = 4
    n = 1500
    b = BL.make_bloom(log2)
    hi, lo = _keys(rng, n)
    b = BL.bloom_insert(b, hi, lo, jnp.ones(n, bool), nh, log2)
    qhi, qlo = _keys(rng, 20000)
    got = np.asarray(BL.bloom_contains(b, qhi, qlo, jnp.ones(20000, bool),
                                       nh, log2))
    fp = got.mean()
    # theory: (1 - e^{-kn/m})^k
    theory = (1 - np.exp(-nh * n / (1 << log2))) ** nh
    assert fp < 3 * theory + 0.01, (fp, theory)


def test_bloom_insert_idempotent_and_incremental(rng):
    log2, nh = 14, 4
    b = BL.make_bloom(log2)
    hi, lo = _keys(rng, 500)
    m = jnp.ones(500, bool)
    b1 = BL.bloom_insert(b, hi, lo, m, nh, log2)
    b2 = BL.bloom_insert(b1, hi, lo, m, nh, log2)
    np.testing.assert_array_equal(np.asarray(b1.words), np.asarray(b2.words))
    # masked-out keys leave no trace
    b3 = BL.bloom_insert(b, hi, lo, jnp.zeros(500, bool), nh, log2)
    assert int(jnp.sum(b3.words)) == 0


@pytest.mark.parametrize("exact", [True, False])
def test_cascade_matches_sequential_model(rng, exact):
    cfg = Config(size_kmer=21, estimated_kmers=1 << 12, singletons=1 << 12,
                 exact=exact, fp_rate=0.001)
    c = BL.make_cascade(cfg)
    seen, solid = set(), set()
    for _ in range(4):
        n = 400
        hi = rng.integers(0, 4, n).astype(np.uint32)
        lo = rng.integers(0, 300, n).astype(np.uint32)  # heavy duplication
        mask = rng.random(n) < 0.95
        # sequential golden cascade
        for h, l, m in zip(hi, lo, mask):
            if not m:
                continue
            key = (int(h), int(l))
            if key in seen:
                solid.add(key)
            else:
                seen.add(key)
        c = BL.cascade_insert(c, jnp.asarray(hi), jnp.asarray(lo),
                              jnp.asarray(mask), cfg)
    qhi = jnp.asarray(np.repeat(np.arange(4, dtype=np.uint32), 300))
    qlo = jnp.asarray(np.tile(np.arange(300, dtype=np.uint32), 4))
    got = np.asarray(BL.cascade_solid(c, qhi, qlo,
                                      jnp.ones(1200, bool), cfg))
    want = np.array([(int(h), int(l)) in solid
                     for h, l in zip(np.asarray(qhi), np.asarray(qlo))])
    if exact:
        np.testing.assert_array_equal(got, want)
    else:
        # Bloom: no false negatives; FPs rare at this sizing
        assert not np.any(want & ~got)
        assert (got & ~want).mean() < 0.02
