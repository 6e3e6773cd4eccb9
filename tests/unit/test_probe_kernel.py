"""Probe kernel (kernels/probe.py) vs the XLA gather reference path."""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu.core import bloom as BL
from faucet_tpu.kernels.probe import SENTINEL, bloom_probe_keys


@pytest.mark.parametrize("log2_bits,n_keys,n_hash",
                         [(16, 300, 3), (19, 5000, 7), (22, 3000, 3)])
def test_probe_matches_gather(rng, log2_bits, n_keys, n_hash):
    b = BL.make_bloom(log2_bits)
    # insert a random key set via the XLA path
    m = n_keys
    ihi = rng.integers(0, 1 << 30, size=m).astype(np.uint32)
    ilo = rng.integers(0, 1 << 32, size=m, dtype=np.uint64).astype(np.uint32)
    b = BL.bloom_insert(b, jnp.asarray(ihi), jnp.asarray(ilo),
                        jnp.ones(m, bool), n_hash, log2_bits)

    # queries: half inserted keys, half fresh, some masked off
    qhi = np.concatenate([ihi[: m // 2],
                          rng.integers(0, 1 << 30, size=m // 2)
                          .astype(np.uint32)])
    qlo = np.concatenate([ilo[: m // 2],
                          rng.integers(0, 1 << 32, size=m // 2,
                                       dtype=np.uint64).astype(np.uint32)])
    qmask = rng.random(m) < 0.8

    want = BL.bloom_contains(b, jnp.asarray(qhi), jnp.asarray(qlo),
                             jnp.asarray(qmask), n_hash, log2_bits)
    block, h1r, h2 = BL._block_h1r_h2(jnp.asarray(qhi), jnp.asarray(qlo),
                                      log2_bits)
    block = jnp.where(jnp.asarray(qmask), block, SENTINEL)
    got = bloom_probe_keys(b.words, block, h1r, h2, n_hash,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # inserted unmasked keys must all be present (no false negatives)
    present = np.asarray(got)[: m // 2]
    np.testing.assert_array_equal(present[qmask[: m // 2]], True)


def test_probe_odd_sizes(rng):
    """Non-multiple-of-chunk and non-multiple-of-unroll key counts."""
    b = BL.make_bloom(16)
    for n in (1, 3, 7, 130, 2049):
        qhi = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
        qlo = rng.integers(0, 1 << 32, size=n,
                           dtype=np.uint64).astype(np.uint32)
        want = BL.bloom_contains(b, jnp.asarray(qhi), jnp.asarray(qlo),
                                 jnp.ones(n, bool), 3, 16)
        block, h1r, h2 = BL._block_h1r_h2(jnp.asarray(qhi),
                                          jnp.asarray(qlo), 16)
        got = bloom_probe_keys(b.words, block, h1r, h2, 3, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
