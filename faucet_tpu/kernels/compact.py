"""Pallas TPU kernel: indices of set mask bits (stream compaction).

Reference analogue: none — this replaces the XLA argsort the scan used to
gather its sparse junction/sink update lanes (SURVEY.md §7.1.1 step 4).
A full 573k-lane 2-key sort costs ~15.6 ms on this chip (BENCH_NOTES.md);
this kernel walks the packed mask words in SMEM with a 32-lane word skip
(sparse masks: most words are zero and cost one scalar branch) and emits
the set lanes' indices with the branch-free running-cursor trick. The
caller then row-gathers the (stacked) per-lane payloads at those indices
— one XLA gather of K rows instead of K argsort-driven permutations of
every payload array.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WORD_CHUNK = 1 << 12  # mask words per grid step (16 KB SMEM)


def _kernel(m_ref, idx_ref, cnt_ref, *, cap: int, n_chunks: int):
    c = pl.program_id(0)
    cw = m_ref.shape[0]

    @pl.when(c == 0)
    def _():
        cnt_ref[0] = 0

    def word(w, cnt):
        lw = m_ref[w]

        def lane(j, cnt):
            # unconditional write + conditional cursor bump: dead lanes
            # write garbage the next live lane overwrites; overflow
            # lanes land in the trash slot at [cap] (overflow is
            # reported via the count so callers can carry it)
            idx_ref[jnp.minimum(cnt, cap)] = (
                jnp.uint32((c * cw + w) * 32) + j.astype(jnp.uint32))
            return cnt + ((lw >> j.astype(jnp.uint32)) & 1).astype(
                jnp.int32)

        return jax.lax.cond(lw != 0,
                            lambda s: jax.lax.fori_loop(0, 32, lane, s),
                            lambda s: s, cnt)

    cnt = jax.lax.fori_loop(0, cw, word, cnt_ref[0])
    cnt_ref[0] = cnt


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def mask_indices(mask: jnp.ndarray, cap: int, interpret: bool = False):
    """Indices of True lanes of bool[N] `mask`, compacted into uint32[cap]
    (original order). Returns (idx, count) where count is the TOTAL number
    of set lanes — count > cap means the tail overflowed and only the
    first cap survive. Slots past min(count, cap) hold garbage; callers
    must mask by arange(cap) < count."""
    n = mask.shape[0]
    # pad so the packed words split evenly into SMEM chunks (128-word
    # granule below one chunk, whole chunks above); zero words skip fast
    granule = 32 * (128 if n <= 32 * _WORD_CHUNK else _WORD_CHUNK)
    padn = (-n) % granule
    m = jnp.concatenate([mask, jnp.zeros((padn,), bool)]) if padn else mask
    words = (m.reshape(-1, 32).astype(jnp.uint32)
             << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                 axis=1, dtype=jnp.uint32)
    w = words.shape[0]
    cw = min(_WORD_CHUNK, w)
    assert w % cw == 0, (w, cw)
    n_chunks = w // cw
    idx, cnt = pl.pallas_call(
        functools.partial(_kernel, cap=cap, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((cw,), lambda c: (c,),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((cap + 1,), lambda c: (0,),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1,), lambda c: (0,),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((cap + 1,), jnp.uint32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=interpret,
    )(words)
    return idx[:cap], cnt[0]
