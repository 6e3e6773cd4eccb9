"""Pallas TPU kernel: batched Bloom membership probes.

Reference analogue: `Bloom::contains` inner loops of the scan and walk
phases (ref:src/Bloom.cpp, src/ReadScanner.cpp [C:high]; SURVEY.md §3.2,
§3.5 hot loops #2/#3). XLA's row gather costs ~145 ns/row on this chip
(latency-bound HBM round trip per row — measured in bench/micro_profile);
this kernel holds the filter in VMEM and answers each probe with one
dynamically-indexed (8, 128) window load plus an in-register bit test —
no HBM round trips, probes unrolled for ILP.

Layout must match core/bloom._block_and_bits: 512-bit block b of the
[W/128, 128]-reshaped word array sits at row b>>3, lanes 16*(b&7)..+15;
probe bit j of a key is (h1r + (j+1)*h2) & 511 within its block.

Filters larger than the VMEM budget stream through in tiles (grid dim 0);
per-key results accumulate across tiles through an aliased result buffer
(each key's block lives in exactly one tile). The common case — solid
filter B during the scan, or a shard-local filter — is single-tile and
takes the branch-free unrolled path.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.uint32(0xFFFFFFFF)
_LANES = 128
_KEY_CHUNK = 1 << 11
_UNROLL = 32
_VMEM_BUDGET = 20 * (1 << 20)


def _kernel(block_ref, h1r_ref, h2_ref, res_in, w_ref, res_ref, *,
            tile_words: int, n_hash: int, n_tiles: int,
            unroll: int = _UNROLL):
    tile_blocks = tile_words // 16
    base = (pl.program_id(0) * tile_blocks).astype(jnp.uint32)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0) *
            np.uint32(_LANES) +
            jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1))
    n = block_ref.shape[0]

    # branch-free body: masked (SENTINEL) lanes do clamped work and
    # store 0 — measured 3x faster than @pl.when skipping, whose
    # predicated regions defeat the scalar/vector pipelining
    # (bench/tune_kernels.py)
    def body(g, _):
        for u in range(unroll):
            i = g * unroll + u
            blk = block_ref[i]
            rel = blk - base
            in_tile = (blk != SENTINEL) & (rel < tile_blocks)
            rel_c = jnp.where(in_tile, rel, np.uint32(0))
            row = (rel_c >> np.uint32(3)).astype(jnp.int32)
            sub = (row & 7).astype(jnp.uint32)
            row8 = pl.multiple_of((row >> 3) << 3, 8)
            tbase = sub * np.uint32(_LANES) + \
                (rel_c & np.uint32(7)) * np.uint32(16)
            h1r = h1r_ref[i]
            h2 = h2_ref[i]
            m = jnp.zeros((8, _LANES), jnp.uint32)
            for j in range(n_hash):
                bit = (h1r + np.uint32(j + 1) * h2) & np.uint32(511)
                tgt = tbase + (bit >> np.uint32(5))
                m = m | jnp.where(flat == tgt,
                                  jnp.uint32(1) << (bit & np.uint32(31)),
                                  np.uint32(0))
            cur = w_ref[pl.ds(row8, 8), :]
            hit = in_tile & (jnp.sum((cur & m) != m) == 0)
            if n_tiles == 1:
                res_ref[i] = hit.astype(jnp.uint32)
            else:
                res_ref[i] = jnp.where(in_tile, hit.astype(jnp.uint32),
                                       res_in[i])
        return 0

    jax.lax.fori_loop(0, n // unroll, body, 0)


def _pick_tile_words(w: int) -> int:
    budget_words = _VMEM_BUDGET // 4
    if w <= budget_words:
        return w
    tile = 1 << 21  # start at 8 MB
    while tile > budget_words or w % tile:
        tile >>= 1
    assert tile >= 4096, w
    return tile


@functools.partial(jax.jit, static_argnames=("n_hash", "unroll",
                                             "interpret"))
def bloom_probe_keys(words: jnp.ndarray, block: jnp.ndarray,
                     h1r: jnp.ndarray, h2: jnp.ndarray, n_hash: int,
                     unroll: int = _UNROLL,
                     interpret: bool = False) -> jnp.ndarray:
    """Membership of each key (all n_hash blocked bits set). SENTINEL
    block entries return False. Returns bool[N]."""
    w = words.shape[0]
    assert w % _LANES == 0
    tile_words = _pick_tile_words(w)
    n_tiles = w // tile_words
    n = block.shape[0]
    n_up = ((n + unroll - 1) // unroll) * unroll
    chunk = min(_KEY_CHUNK, max(n_up, unroll))
    pad = (-n) % chunk
    if pad:
        fill = lambda a, v: jnp.concatenate(
            [a, jnp.full((pad,), v, jnp.uint32)])
        block, h1r, h2 = fill(block, SENTINEL), fill(h1r, 0), fill(h2, 0)
    n_chunks = block.shape[0] // chunk

    spec_s = pl.BlockSpec((chunk,), lambda t, c: (c,),
                          memory_space=pltpu.SMEM)
    spec_w = pl.BlockSpec((tile_words // _LANES, _LANES),
                          lambda t, c: (t, 0), memory_space=pltpu.VMEM)
    res0 = jnp.zeros((block.shape[0],), jnp.uint32)
    res = pl.pallas_call(
        functools.partial(_kernel, tile_words=tile_words, n_hash=n_hash,
                          n_tiles=n_tiles, unroll=unroll),
        grid=(n_tiles, n_chunks),
        in_specs=[spec_s, spec_s, spec_s, spec_s, spec_w],
        out_specs=spec_s,
        out_shape=jax.ShapeDtypeStruct((block.shape[0],), jnp.uint32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(block, h1r, h2, res0,
      words.reshape(w // _LANES, _LANES))
    return (res[:n] if pad else res) > 0
