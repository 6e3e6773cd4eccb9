"""Pallas TPU kernel: bit-scatter-OR into a Bloom bit array.

The north-star M1 kernel (SURVEY.md §7.3, BASELINE "Pallas ... Bloom
probe/insert ... over HBM-resident bit arrays"). XLA's scatter lowers to
a serialized ~100-200 ns/element loop with an HBM round trip per update
(measured in this session's micro-bench) — for the ~3M probe-bit inserts
per stream batch that is ~0.5 s. This kernel instead:

  - tiles the bit array over a grid; the TPU grid is SEQUENTIAL on the
    core, so read-modify-write carries no races by construction;
  - holds each tile in VMEM and replays the (unsorted) position list
    against it with a scalar loop — VMEM RMW is a few cycles, not an
    HBM round trip; out-of-tile and sentinel positions are predicated
    off;
  - aliases the words input to the output so tiles stream through VMEM
    without a second HBM copy. Tile-major grid order keeps each filter
    tile resident while every position chunk replays against it.

Cost: positions * n_tiles scalar iterations; callers size tiles so the
filter tile fits VMEM — single-tile for solid filter B, a few passes
for the larger filter A.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.uint32(0xFFFFFFFF)
_TILE_WORDS = 1 << 19           # 2 MB of filter per tile (pow2)
_POS_CHUNK = 1 << 11            # positions staged per SMEM block (8 KB)


_LANES = 128


def _kernel(pos_ref, win_ref, wout_ref, *, tile_words: int):
    """Tile layout is [tile_words // 128, 128]; each position updates one
    dynamically-indexed 128-word row (Mosaic allows dynamic sublane
    slices but not scalar VMEM stores)."""
    tile = pl.program_id(0)
    base = (tile * tile_words * 32).astype(jnp.uint32)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0)

    # first chunk of each tile: seed the output tile from the input
    @pl.when(pl.program_id(1) == 0)
    def _():
        wout_ref[:] = win_ref[:]

    def body(i, _):
        p = pos_ref[i]
        rel = p - base
        widx = rel >> np.uint32(5)

        @pl.when((p != SENTINEL) & (widx < tile_words))
        def _():
            row = (widx >> np.uint32(7)).astype(jnp.int32)
            lane = widx & np.uint32(_LANES - 1)
            # Mosaic requires sublane-aligned dynamic slices: RMW the
            # aligned 8-row window containing the target row
            row8 = pl.multiple_of((row >> 3) << 3, 8)
            sub = (row & 7).astype(jnp.uint32)
            one = jnp.uint32(1) << (rel & np.uint32(31))
            hit = jnp.where((lane_ids == lane) & (row_ids == sub), one,
                            np.uint32(0))
            cur = wout_ref[pl.ds(row8, 8), :]
            wout_ref[pl.ds(row8, 8), :] = cur | hit

        return 0

    jax.lax.fori_loop(0, pos_ref.shape[0], body, 0)


def _kernel_keys(block_ref, h1r_ref, h2_ref, win_ref, wout_ref, *,
                 tile_words: int, n_hash: int):
    """Per-KEY variant: all n_hash probe bits of a key live in one
    512-bit block (core/bloom blocked layout), i.e. within one 128-lane
    row — one aligned-window RMW per key instead of one per bit."""
    tile = pl.program_id(0)
    tile_blocks = tile_words // 16
    base_block = (tile * tile_blocks).astype(jnp.uint32)
    lane_ids = jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        wout_ref[:] = win_ref[:]

    def body(i, _):
        blk = block_ref[i]
        rel = blk - base_block

        @pl.when((blk != SENTINEL) & (rel < tile_blocks))
        def _():
            h1r = h1r_ref[i]
            h2 = h2_ref[i]
            row = (rel >> np.uint32(3)).astype(jnp.int32)
            sub = (row & 7).astype(jnp.uint32)
            row8 = pl.multiple_of((row >> 3) << 3, 8)
            lane0 = (rel & np.uint32(7)) * np.uint32(16)
            hit = jnp.zeros((8, _LANES), jnp.uint32)
            for j in range(n_hash):
                bit = (h1r + np.uint32(j + 1) * h2) & np.uint32(511)
                lane = lane0 + (bit >> np.uint32(5))
                one = jnp.uint32(1) << (bit & np.uint32(31))
                hit = hit | jnp.where(
                    (lane_ids == lane) & (row_ids == sub), one,
                    np.uint32(0))
            cur = wout_ref[pl.ds(row8, 8), :]
            wout_ref[pl.ds(row8, 8), :] = cur | hit

        return 0

    jax.lax.fori_loop(0, block_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("n_hash", "tile_words",
                                             "key_chunk", "interpret"))
def scatter_or_keys(words: jnp.ndarray, block: jnp.ndarray,
                    h1r: jnp.ndarray, h2: jnp.ndarray, n_hash: int,
                    tile_words: int = _TILE_WORDS,
                    key_chunk: int = _POS_CHUNK,
                    interpret: bool = False) -> jnp.ndarray:
    """Set the n_hash blocked-Bloom bits of each key (SENTINEL block
    entries skipped). bit_j = (h1r + (j+1)*h2) & 511 inside 512-bit
    block `block` — must match core/bloom._block_and_bits exactly."""
    W = words.shape[0]
    assert W % _LANES == 0
    tile_words = min(tile_words, W)
    assert W % tile_words == 0
    n_tiles = W // tile_words
    N = block.shape[0]
    key_chunk = min(key_chunk, max(N, 8))
    pad = (-N) % key_chunk
    if pad:
        fill = lambda a, v: jnp.concatenate(
            [a, jnp.full((pad,), v, jnp.uint32)])
        block, h1r, h2 = (fill(block, SENTINEL), fill(h1r, 0),
                          fill(h2, 0))
    n_chunks = block.shape[0] // key_chunk

    spec_s = pl.BlockSpec((key_chunk,), lambda t, c: (c,),
                          memory_space=pltpu.SMEM)
    spec_w = pl.BlockSpec((tile_words // _LANES, _LANES),
                          lambda t, c: (t, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_keys, tile_words=tile_words,
                          n_hash=n_hash),
        grid=(n_tiles, n_chunks),
        in_specs=[spec_s, spec_s, spec_s, spec_w],
        out_specs=spec_w,
        out_shape=jax.ShapeDtypeStruct((W // _LANES, _LANES), jnp.uint32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(block, h1r, h2, words.reshape(W // _LANES, _LANES))
    return out.reshape(W)


@functools.partial(jax.jit, static_argnames=("tile_words", "pos_chunk",
                                             "interpret"))
def scatter_or_bits(words: jnp.ndarray, positions: jnp.ndarray,
                    tile_words: int = _TILE_WORDS,
                    pos_chunk: int = _POS_CHUNK,
                    interpret: bool = False) -> jnp.ndarray:
    """OR `1 << (pos % 32)` into word `pos // 32` for every position.

    words: uint32[W] (W a multiple of tile_words, or below one tile);
    positions: uint32[N], SENTINEL entries skipped. The words buffer is
    donated via input/output aliasing.
    """
    W = words.shape[0]
    assert W % _LANES == 0
    tile_words = min(tile_words, W)
    assert W % tile_words == 0, (W, tile_words)
    n_tiles = W // tile_words
    N = positions.shape[0]
    pos_chunk = min(pos_chunk, max(N, 8))
    pad = (-N) % pos_chunk
    if pad:
        positions = jnp.concatenate(
            [positions, jnp.full((pad,), SENTINEL, jnp.uint32)])
    n_chunks = positions.shape[0] // pos_chunk

    out = pl.pallas_call(
        functools.partial(_kernel, tile_words=tile_words),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((pos_chunk,), lambda t, c: (c,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((tile_words // _LANES, _LANES),
                               lambda t, c: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_words // _LANES, _LANES),
                               lambda t, c: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W // _LANES, _LANES), jnp.uint32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(positions, words.reshape(W // _LANES, _LANES))
    return out.reshape(W)
