"""32-bit hashing for k-mer codes.

The reference uses Minia-lineage multiplicative hashing over the packed
k-mer (SURVEY.md §2.1 "Bloom filter", ref:src/Bloom.cpp [C:high]); hash
functions here differ by design — contig-level equivalence, not bit-level
Bloom equality, is the parity target (SURVEY.md §7.1.6).

Scheme: murmur3's 32-bit finalizer (`fmix32`) chained over the two words of
a k-mer code yields two independent 32-bit hashes (h1, h2). Bloom probe i
uses Kirsch–Mitzenmacher double hashing h1 + i*h2 (h2 forced odd), which is
provably fp-rate-preserving and avoids 64-bit multiplies the TPU lacks.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32

_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_SEED1 = np.uint32(0x9E3779B9)
_SEED2 = np.uint32(0x85EBCA77)


def fmix32(x):
    """murmur3 32-bit finalizer; good avalanche, wraps on uint32."""
    x = x.astype(U32)
    x = x ^ (x >> np.uint32(16))
    x = x * _C1
    x = x ^ (x >> np.uint32(13))
    x = x * _C2
    x = x ^ (x >> np.uint32(16))
    return x


def hash_pair(hi, lo):
    """(hi, lo) k-mer code -> (h1, h2) independent 32-bit hashes.

    h2 is forced odd so double-hashed probe strides are units mod 2^b.
    """
    h1 = fmix32(lo.astype(U32) ^ fmix32(hi.astype(U32) ^ _SEED1))
    h2 = fmix32(hi.astype(U32) ^ fmix32(lo.astype(U32) ^ _SEED2)) | np.uint32(1)
    return h1, h2


def bloom_positions(h1, h2, n_hash: int, log2_bits: int):
    """Bit positions for the n_hash Bloom probes of each item.

    Returns uint32[..., n_hash] in [0, 2**log2_bits).
    """
    i = jnp.arange(n_hash, dtype=U32)
    pos = h1[..., None] + i * h2[..., None]
    return pos & np.uint32((1 << log2_bits) - 1)


def shard_of(h1, log2_shards: int):
    """Owner shard of a k-mer = top bits of h1 (independent of the low
    bits used for Bloom/table indexing)."""
    if log2_shards == 0:
        return jnp.zeros_like(h1, dtype=U32)
    return h1 >> np.uint32(32 - log2_shards)
