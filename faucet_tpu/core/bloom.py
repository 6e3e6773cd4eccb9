"""Bloom filters and the two-level solidity cascade, plus an exact-table
backend with identical call surface.

Reference analogue: ref:src/Bloom.{h,cpp} and the A→B cascade wired in the
driver (SURVEY.md §2.1 "Bloom filter" / "Two-level cascade policy",
[C:high]); the exact backend mirrors the Minia-lineage exact-membership
debug substitute [C:low] and is the golden-test mode (SURVEY.md §7.1.6).

TPU re-design (SURVEY.md §7.1.2 "no atomics needed"):
- the filter is a uint32 bit-array in HBM; insertion must be bitwise-OR,
  which XLA scatters lack — so inserts run as: flatten all probe bit
  positions, sort, drop duplicates, segment-sum the (distinct!) one-hot
  bit values per word (sum of distinct bits == OR), then gather-OR-set
  each touched word exactly once. Deterministic, idempotent, race-free.
- membership probes are plain gathers + bit tests, AND-reduced over the
  n_hash probes.

Within-batch cascade semantics: a batch is one "stream moment". Exact
sequential equivalence with the reference's per-read insert is preserved
by counting duplicate canonical k-mers inside the batch: a k-mer occurring
c>=2 times in a batch is solid regardless of filter A (its first
occurrence would have primed A for the second).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from faucet_tpu.core import table as T
from faucet_tpu.core.hashing import hash_pair

U32 = jnp.uint32
_SENTINEL = np.uint32(0xFFFFFFFF)


# ---- plain Bloom filter ------------------------------------------------


class Bloom(NamedTuple):
    words: jnp.ndarray  # uint32[2**log2_bits / 32]


def make_bloom(log2_bits: int) -> Bloom:
    assert log2_bits >= 5
    return Bloom(words=jnp.zeros((1 << (log2_bits - 5),), dtype=U32))


BLOCK_BITS = 9          # 512-bit blocks = 16 words = 64 B
BLOCK_WORDS = 1 << (BLOCK_BITS - 5)


def _block_h1r_h2(khi, klo, log2_bits: int, shard_bits: int = 0):
    """Shared blocked-Bloom addressing: (block index, rotated h1, h2).

    bit_j of a key = (h1r + (j+1)*h2) & 511 inside `block` — the single
    source of truth for both the XLA path and the Pallas insert kernel
    (kernels/bloom_scatter.scatter_or_keys)."""
    h1, h2 = hash_pair(khi, klo)
    local_block_bits = log2_bits - shard_bits - BLOCK_BITS
    block = h1 & np.uint32((1 << local_block_bits) - 1)
    if shard_bits:
        owner = (h1 >> np.uint32(32 - shard_bits)).astype(U32)
        block = block | (owner << np.uint32(local_block_bits))
    # bit stream decorrelated from the block choice via h1's high half
    h1r = (h1 >> np.uint32(16)) | (h1 << np.uint32(16))
    return block, h1r, h2


def _block_and_bits(khi, klo, n_hash: int, log2_bits: int,
                    shard_bits: int = 0):
    """Blocked-Bloom addressing: all n_hash probe bits of a key live in
    ONE 512-bit block, so a probe is a single contiguous 64 B row gather
    instead of n_hash scattered word gathers — the difference between
    HBM-transaction-bound and roofline on TPU (SURVEY.md §7.1, M1; same
    design as GPU Bloom k-mer filters, PAPERS.md cuSBF). Costs ~1.2x
    bits for equal fp at 1% — absorbed by pow2 sizing.

    The top shard_bits of the BLOCK address come from the key's owner
    shard (top bits of h1), so the array is a hash-range partition:
    slicing into 2**shard_bits pieces yields the per-shard local filters
    (SURVEY.md §7.1.3).

    Returns (block uint32[...], bits uint32[..., n_hash] in [0, 512)).
    """
    block, h1r, h2 = _block_h1r_h2(khi, klo, log2_bits, shard_bits)
    i = jnp.arange(n_hash, dtype=U32)
    bits = (h1r[..., None] + (i + np.uint32(1)) * h2[..., None]) \
        & np.uint32((1 << BLOCK_BITS) - 1)
    return block, bits


def _positions(khi, klo, n_hash: int, log2_bits: int,
               shard_bits: int = 0):
    """Global bit positions (block << 9 | bit) — the insert path's view
    of the blocked layout."""
    block, bits = _block_and_bits(khi, klo, n_hash, log2_bits, shard_bits)
    return (block[..., None] << np.uint32(BLOCK_BITS)) | bits


def _use_pallas() -> bool:
    import jax as _jax

    try:
        return _jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def bloom_insert(b: Bloom, khi, klo, mask, n_hash: int,
                 log2_bits: int, shard_bits: int = 0) -> Bloom:
    """OR all probe bits of the masked keys into the filter.

    khi/klo/mask: 1-D [N]. On TPU the insert runs as the Pallas
    scatter-OR kernel (kernels/bloom_scatter) — XLA scatters serialize at
    ~100ns/element; the kernel does one aligned VMEM row RMW per key.
    """
    if _use_pallas():
        from faucet_tpu.kernels.bloom_scatter import (SENTINEL,
                                                      scatter_or_keys)

        block, h1r, h2 = _block_h1r_h2(khi, klo, log2_bits, shard_bits)
        block = jnp.where(mask, block, SENTINEL)
        return Bloom(words=scatter_or_keys(b.words, block, h1r, h2,
                                           n_hash))
    pos = _positions(khi, klo, n_hash, log2_bits,
                     shard_bits).reshape(-1)  # [N*h]
    m = jnp.broadcast_to(mask[:, None], (mask.shape[0], n_hash)).reshape(-1)
    pos = jnp.where(m, pos, _SENTINEL)
    pos = jax.lax.sort(pos)
    uniq = jnp.concatenate(
        [jnp.ones((1,), bool), pos[1:] != pos[:-1]]) & (pos != _SENTINEL)
    word = pos >> np.uint32(5)
    one = jnp.where(uniq, np.uint32(1) << (pos & np.uint32(31)),
                    np.uint32(0))
    # group by word: distinct bits per word sum to their OR
    new_word = jnp.concatenate(
        [jnp.ones((1,), bool), word[1:] != word[:-1]])
    seg = jnp.cumsum(new_word.astype(jnp.int32)) - 1
    n = pos.shape[0]
    # seg ids are sorted: lets XLA vectorize the underlying scatters
    orv = jax.ops.segment_sum(one, seg, num_segments=n,
                              indices_are_sorted=True)
    segword = jax.ops.segment_max(jnp.where(uniq, word, np.uint32(0)),
                                  seg, num_segments=n,
                                  indices_are_sorted=True)
    seg_live = jax.ops.segment_max(uniq.astype(jnp.int32), seg,
                                   num_segments=n,
                                   indices_are_sorted=True) > 0
    # segment representatives carry unique, ascending word indices; dead
    # segments trail (sentinels sort last) and get unique OOB indices so
    # the sorted/unique promises hold and XLA vectorizes the scatter
    W = b.words.shape[0]
    dead_idx = np.uint32(W) + jnp.arange(n, dtype=U32)
    idx = jnp.where(seg_live, segword, dead_idx)
    cur = b.words.at[jnp.where(seg_live, segword, 0)].get(mode="clip")
    return Bloom(words=b.words.at[idx].set(
        cur | orv, mode="drop", indices_are_sorted=True,
        unique_indices=True))


def bloom_contains(b: Bloom, khi, klo, mask, n_hash: int, log2_bits: int,
                   shard_bits: int = 0):
    """Membership probes. On TPU: the Pallas VMEM-resident probe kernel
    (kernels/probe.py) — XLA's row gather is ~145 ns/row on this chip,
    the kernel ~4x less. CPU fallback: row gather + bit tests."""
    if _use_pallas():
        from faucet_tpu.kernels.probe import SENTINEL as PSENT
        from faucet_tpu.kernels.probe import bloom_probe_keys

        shape = khi.shape
        block, h1r, h2 = _block_h1r_h2(khi.reshape(-1), klo.reshape(-1),
                                       log2_bits, shard_bits)
        block = jnp.where(jnp.asarray(mask).reshape(-1), block, PSENT)
        return bloom_probe_keys(b.words, block, h1r, h2,
                                n_hash).reshape(shape)
    block, bits = _block_and_bits(khi, klo, n_hash, log2_bits, shard_bits)
    rows = b.words.reshape(-1, BLOCK_WORDS)[block.reshape(-1)]
    rows = rows.reshape(block.shape + (BLOCK_WORDS,))
    w = jnp.take_along_axis(rows, (bits >> np.uint32(5)).astype(jnp.int32),
                            axis=-1)
    bit = (w >> (bits & np.uint32(31))) & np.uint32(1)
    return jnp.all(bit == 1, axis=-1) & mask


# ---- solidity cascade (two Blooms, or two exact tables) ----------------


class Cascade(NamedTuple):
    """Filter A (seen >= 1) and filter B (solid, seen >= 2)."""
    a_bloom: Bloom
    b_bloom: Bloom
    a_table: T.Table
    b_table: T.Table


def make_cascade(cfg) -> Cascade:
    # unused halves are dummy-sized but must stay splittable into
    # n_shards pieces (one block each) for the sharded PartitionSpec
    dummy_log2 = BLOCK_BITS + cfg.shard_bits
    dummy_cap = max(2, 2 * cfg.n_shards)
    if cfg.exact:
        return Cascade(make_bloom(dummy_log2), make_bloom(dummy_log2),
                       T.make(cfg.cascade_cap_a), T.make(cfg.cascade_cap_b))
    return Cascade(make_bloom(cfg.bloom_a_bits.bit_length() - 1),
                   make_bloom(cfg.bloom_b_bits.bit_length() - 1),
                   T.make(dummy_cap), T.make(dummy_cap))


def _batch_counts(khi, klo, mask):
    """Sorted batch keys + per-representative occurrence count + the
    original lane index of each sorted position (stable, so the
    representative is the key's first in-batch occurrence)."""
    n = khi.shape[0]
    khi_m = jnp.where(mask, khi, _SENTINEL)
    klo_m = jnp.where(mask, klo, _SENTINEL)
    iota = jnp.arange(n, dtype=jnp.int32)
    skhi, sklo, sidx = jax.lax.sort((khi_m, klo_m, iota), num_keys=2)
    head = jnp.concatenate(
        [jnp.ones((1,), bool),
         (skhi[1:] != skhi[:-1]) | (sklo[1:] != sklo[:-1])])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), seg,
                                 num_segments=n)[seg]
    rep = head & (skhi != _SENTINEL)
    return skhi, sklo, counts, rep, sidx


def cascade_insert(c: Cascade, khi, klo, mask, cfg,
                   sparse: bool = False) -> Cascade:
    """Phase-1 load: if A contains k: B.add(k) else A.add(k), batched
    (SURVEY.md §A.2), preserving sequential semantics via in-batch counts.

    sparse=True hints that mask is mostly-False (e.g. the branch-node
    endpoint inserts): the TPU kernel then skips dead lanes 32-at-a-time.
    """
    return cascade_insert_nb(c, khi, klo, mask, cfg, sparse=sparse)[0]


def cascade_insert_nb(c: Cascade, khi, klo, mask, cfg, sparse: bool = False
                      ) -> Tuple[Cascade, jnp.ndarray]:
    c, new_b, _ = cascade_insert_nbs(c, khi, klo, mask, cfg, sparse=sparse)
    return c, new_b


def cascade_insert_nbs(c: Cascade, khi, klo, mask, cfg,
                       sparse: bool = False
                       ) -> Tuple[Cascade, jnp.ndarray, jnp.ndarray]:
    """cascade_insert + per-lane (new_b, solid) flags: new_b[i] is True
    on exactly the lane whose insert first promoted its k-mer into B
    (drives the branch-node cascade, core/nodes.py); solid[i] is B
    membership as of the lane's OWN insert — the streaming scan's window
    solidity, produced for free by the insert pass instead of a second
    probe pass (one fewer probe per window in single-pass mode).

    On TPU the whole cascade runs as ONE fused Pallas pass
    (kernels/cascade.py): keys are processed sequentially in VMEM, which
    IS the reference semantics — provably bit-identical to the
    sort+count formulation below (tests/unit/test_cascade_kernel.py;
    the fallback's solid uses the same at-its-turn rule: in B before, in
    A before, or any earlier in-batch occurrence).
    """
    sb = cfg.shard_bits
    n = khi.shape[0]
    if not cfg.exact and _use_pallas():
        from faucet_tpu.kernels.cascade import (SENTINEL as CSENT,
                                                cascade_insert_fused)

        la = cfg.bloom_a_bits.bit_length() - 1
        lb = cfg.bloom_b_bits.bit_length() - 1
        block_a, h1r, h2 = _block_h1r_h2(khi, klo, la, sb)
        block_b, _, _ = _block_h1r_h2(khi, klo, lb, sb)
        mask = jnp.asarray(mask)
        block_a = jnp.where(mask, block_a, CSENT)
        # dense masks take the two-phase group kernel (loads pipelined
        # across the group, one store->load stall per group); genuinely
        # sparse masks (node endpoint inserts, ~1-5% live) compact live
        # lanes in-kernel first. NOTE: pre-filtering already-in-B keys
        # was tried twice in round 1 (word-skip: 2.4x slower; compaction:
        # neutral) — the two-phase kernel makes the insert path nearly
        # probe-speed, so a prefilter pass no longer pays for itself.
        import os as _os

        aw, bw, new_b, solid = cascade_insert_fused(
            c.a_bloom.words, c.b_bloom.words, block_a, block_b, h1r, h2,
            cfg.n_hash_a, cfg.n_hash_b,
            live=(mask if sparse else None), sparse=sparse,
            with_solid=True,
            cond_store=_os.environ.get("FAUCET_CASCADE_CONDSTORE",
                                       "0") == "1")
        return (c._replace(a_bloom=Bloom(aw), b_bloom=Bloom(bw)), new_b,
                solid)
    skhi, sklo, counts, rep, sidx = _batch_counts(khi, klo, mask)
    # per-lane occurrence rank within its sorted key group (stable sort:
    # rank 0 is the first in-batch occurrence)
    head = jnp.concatenate(
        [jnp.ones((1,), bool),
         (skhi[1:] != skhi[:-1]) | (sklo[1:] != sklo[:-1])])
    iota = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, iota, 0))
    rank = iota - seg_start
    if cfg.exact:
        in_a = T.contains(c.a_table, skhi, sklo, rep, shard_bits=sb)
        in_b = T.contains(c.b_table, skhi, sklo, rep, shard_bits=sb)
        add_b = rep & (in_a | (counts >= 2))
        new_b = jnp.zeros((n,), bool).at[sidx].set(add_b & ~in_b)
        sol_sorted = (in_b[seg_start] | in_a[seg_start] | (rank >= 1)) \
            & (skhi != _SENTINEL)
        solid = jnp.zeros((n,), bool).at[sidx].set(sol_sorted)
        return c._replace(
            a_table=T.upsert(c.a_table, skhi, sklo, (), rep & ~in_a,
                             modes=(), shard_bits=sb),
            b_table=T.upsert(c.b_table, skhi, sklo, (), add_b, modes=(),
                             shard_bits=sb)), new_b, solid
    la = cfg.bloom_a_bits.bit_length() - 1
    lb = cfg.bloom_b_bits.bit_length() - 1
    in_a = bloom_contains(c.a_bloom, skhi, sklo, rep, cfg.n_hash_a, la, sb)
    in_b = bloom_contains(c.b_bloom, skhi, sklo, rep, cfg.n_hash_b, lb, sb)
    add_b = rep & (in_a | (counts >= 2))
    add_a = rep & ~in_a
    new_b = jnp.zeros((n,), bool).at[sidx].set(add_b & ~in_b)
    sol_sorted = (in_b[seg_start] | in_a[seg_start] | (rank >= 1)) \
        & (skhi != _SENTINEL)
    solid = jnp.zeros((n,), bool).at[sidx].set(sol_sorted)
    return c._replace(
        a_bloom=bloom_insert(c.a_bloom, skhi, sklo, add_a, cfg.n_hash_a,
                             la, sb),
        b_bloom=bloom_insert(c.b_bloom, skhi, sklo, add_b, cfg.n_hash_b,
                             lb, sb)), new_b, solid


def cascade_solid(c: Cascade, khi, klo, mask, cfg):
    """Membership in B — the only query the graph phases use."""
    sb = cfg.shard_bits
    if cfg.exact:
        shape = khi.shape
        f = T.contains(c.b_table, khi.reshape(-1), klo.reshape(-1),
                       jnp.asarray(mask).reshape(-1), shard_bits=sb)
        return f.reshape(shape)
    lb = cfg.bloom_b_bits.bit_length() - 1
    return bloom_contains(c.b_bloom, khi, klo, mask, cfg.n_hash_b, lb, sb)
