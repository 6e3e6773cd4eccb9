"""Pallas TPU kernel: fused Bloom-cascade insert (probe A + insert A/B).

Reference analogue: the phase-1 load loop `if A.contains(k): B.add(k)
else A.add(k)` (SURVEY.md §A.2, ref:src/Faucet.cpp driver + src/Bloom.*
[C:high]). One sequential in-VMEM pass per key replaces the previous
four-stage XLA+Pallas pipeline (2-key batch sort for duplicate counts,
gather-probe of A, Pallas insert pass over A, Pallas insert pass over B):

  - filter B is VMEM-resident for the whole kernel; filter A streams
    through VMEM in tiles (grid dim 0) — aliased in/out blocks share one
    buffer, so a 16 MB A sits in a single tile on this chip;
  - keys are processed IN STREAM ORDER by a scalar loop, so the cascade
    is EXACTLY the reference's sequential semantics — a k-mer occurring
    twice in one batch primes A with its first occurrence and lands in B
    with its second, with no duplicate-counting machinery;
  - A and B share the in-block bit stream bit_j = (h1r + (j+1)*h2) & 511
    (core/bloom._block_and_bits), so the per-key bit math is computed
    once; only the 512-bit-block placement differs.

Layout invariants (must match core/bloom exactly): filters are uint32
words reshaped [W/128, 128]; 512-bit block b occupies row b>>3, lanes
16*(b&7)..16*(b&7)+15; Mosaic dynamic sublane slices are 8-aligned, so
each update RMWs the aligned (8, 128) window around the target row.
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
# A-tile sizing: aliased in/out blocks share one VMEM buffer (verified
# empirically: a 16 MB tile + 4 MB resident filter compiles and runs
# fastest, bench/tune_kernels.py), so the budget counts UNIQUE buffers.
_VMEM_BUDGET = 22 * (1 << 20)


def _window(rel_block):
    """block index (within tile) -> (aligned row8, sublane, lane0)."""
    row = (rel_block >> np.uint32(3)).astype(jnp.int32)
    sub = (row & 7).astype(jnp.uint32)
    row8 = pl.multiple_of((row >> 3) << 3, 8)
    lane0 = (rel_block & np.uint32(7)) * np.uint32(16)
    return row8, sub, lane0


def _kernel(ba_ref, bb_ref, h1r_ref, h2_ref, nb_in, a_in, b_in,
            a_out, b_out, nb_out, *, tile_words: int, n_hash_a: int,
            n_hash_b: int, n_tiles: int, group: int = None):
    tile_blocks = tile_words // 16
    base = (pl.program_id(0) * tile_blocks).astype(jnp.uint32)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0) *
            np.uint32(_LANES) +
            jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1))

    @pl.when(pl.program_id(1) == 0)
    def _():
        a_out[:] = a_in[:]

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(0) == 0))
    def _():
        b_out[:] = b_in[:]

    def mask_at(sub, lane0, h1r, h2, n_hash):
        m = jnp.zeros((8, _LANES), jnp.uint32)
        tbase = sub * np.uint32(_LANES) + lane0
        for j in range(n_hash):
            bit = (h1r + np.uint32(j + 1) * h2) & np.uint32(511)
            tgt = tbase + (bit >> np.uint32(5))
            m = m | jnp.where(flat == tgt,
                              jnp.uint32(1) << (bit & np.uint32(31)),
                              np.uint32(0))
        return m

    # Branch-free unrolled body: G keys per iteration, loads pipelined.
    # @pl.when regions measured 1.5-3x slower (they defeat scalar/vector
    # pipelining; bench/tune_kernels.py); instead every key does both
    # filters' clamped RMW with conditional VALUES. Exact sequential
    # semantics inside a group are restored by patching: key g's
    # effective window state ORs in the masks of earlier group members
    # that hit the SAME aligned (8,128) window and actually inserted —
    # this covers in-batch duplicates (same block by definition) and
    # coincidental window sharing.
    G = group or (4 if n_tiles == 1 else 1)
    zero = np.uint32(0)

    def body(it, _):
        i0 = it * G
        blk_a = [ba_ref[i0 + g] for g in range(G)]
        h1r = [h1r_ref[i0 + g] for g in range(G)]
        h2 = [h2_ref[i0 + g] for g in range(G)]
        valid, row8a, mask_a, cur_a = [], [], [], []
        row8b, mask_b, cur_b = [], [], []
        for g in range(G):
            rel = blk_a[g] - base
            ok = (blk_a[g] != SENTINEL) & (rel < tile_blocks)
            rel_c = jnp.where(ok, rel, zero)
            r8a, sub_a, lane0a = _window(rel_c)
            r8b, sub_b, lane0b = _window(bb_ref[i0 + g])
            valid.append(ok)
            row8a.append(r8a)
            row8b.append(r8b)
            mask_a.append(mask_at(sub_a, lane0a, h1r[g], h2[g], n_hash_a))
            mask_b.append(mask_at(sub_b, lane0b, h1r[g], h2[g], n_hash_b))
            cur_a.append(a_out[pl.ds(r8a, 8), :])
            cur_b.append(b_out[pl.ds(r8b, 8), :])

        in_a, add_a = [], []
        eff_a, eff_b = list(cur_a), list(cur_b)
        for g in range(G):
            for i in range(g):
                eff_a[g] = eff_a[g] | jnp.where(
                    (row8a[i] == row8a[g]) & add_a[i], mask_a[i], zero)
                eff_b[g] = eff_b[g] | jnp.where(
                    (row8b[i] == row8b[g]) & in_a[i], mask_b[i], zero)
            ia = valid[g] & (jnp.sum((eff_a[g] & mask_a[g])
                                     != mask_a[g]) == 0)
            was_b = jnp.sum((eff_b[g] & mask_b[g]) != mask_b[g]) == 0
            in_a.append(ia)
            add_a.append(valid[g] & jnp.logical_not(ia))
            # packed flags: bit0 = first B promotion, bit1 = in B after
            # this key's own insert (the scan's window solidity, free)
            new_b = (ia & jnp.logical_not(was_b)).astype(jnp.uint32) \
                + jnp.uint32(2) * (ia | was_b).astype(jnp.uint32)
            if n_tiles == 1:
                nb_out[i0 + g] = new_b
            else:
                # carry each key's flag across A-tile passes (exactly
                # one pass owns its block)
                nb_out[i0 + g] = jnp.where(valid[g], new_b,
                                           nb_in[i0 + g])

        for g in range(G):
            a_out[pl.ds(row8a[g], 8), :] = eff_a[g] | jnp.where(
                add_a[g], mask_a[g], zero)
            b_out[pl.ds(row8b[g], 8), :] = eff_b[g] | jnp.where(
                in_a[g], mask_b[g], zero)
        return 0

    jax.lax.fori_loop(0, ba_ref.shape[0] // G, body, 0)


def _kernel_v2(gb_ref, ba_ref, bb_ref, h1r_ref, h2_ref, nb_in, a_in,
               b_in, a_out, b_out, nb_out, *, tile_words: int,
               n_hash_a: int, n_hash_b: int, G: int,
               cond_store: bool = False):
    """Two-phase group cascade: per group of G keys, ALL window loads
    issue first (they pipeline like the read-only probe kernel,
    ~15 ns/key), then all stores. The store->load serialization that
    floors the sequential kernel at ~150 ns/key is paid once per GROUP
    instead of once per key.

    Correctness without in-group patching: if no two keys of a group
    share an aligned (8,128) window in A nor in B, then (a) no store can
    clobber another key's store (each window is written by at most one
    key), and (b) every key's membership test is unaffected by the other
    group members' inserts (different 512-bit blocks => disjoint bits).
    The fast path is then bit-identical to sequential semantics. Groups
    WITH a same-window pair (including in-batch duplicate keys) are
    flagged by an XLA-side precompute (gb_ref, one uint32 per group) and
    replayed through the exact sequential per-key path under lax.cond —
    rare enough (same-window pair probability ~G^2/2/n_windows) that the
    group cost stays near the fast path.

    Single-tile A only (callers fall back to _kernel when A tiles): the
    group-bad precompute cannot see tile-clamping, which would route
    out-of-tile lanes' writebacks onto window 0 of every tile."""
    flat = (jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0) *
            np.uint32(_LANES) +
            jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1))

    @pl.when(pl.program_id(1) == 0)
    def _():
        a_out[:] = a_in[:]
        b_out[:] = b_in[:]

    def mask_at(sub, lane0, h1r, h2, n_hash):
        m = jnp.zeros((8, _LANES), jnp.uint32)
        tbase = sub * np.uint32(_LANES) + lane0
        for j in range(n_hash):
            bit = (h1r + np.uint32(j + 1) * h2) & np.uint32(511)
            tgt = tbase + (bit >> np.uint32(5))
            m = m | jnp.where(flat == tgt,
                              jnp.uint32(1) << (bit & np.uint32(31)),
                              np.uint32(0))
        return m

    zero = np.uint32(0)

    def key_state(i):
        blk_a = ba_ref[i]
        ok = blk_a != SENTINEL
        rel_c = jnp.where(ok, blk_a, zero)
        r8a, sub_a, lane0a = _window(rel_c)
        r8b, sub_b, lane0b = _window(bb_ref[i])
        h1r = h1r_ref[i]
        h2 = h2_ref[i]
        mask_a = mask_at(sub_a, lane0a, h1r, h2, n_hash_a)
        mask_b = mask_at(sub_b, lane0b, h1r, h2, n_hash_b)
        return ok, r8a, r8b, mask_a, mask_b

    def finish(i, ok, r8a, r8b, mask_a, mask_b, cur_a, cur_b):
        in_a = ok & (jnp.sum((cur_a & mask_a) != mask_a) == 0)
        was_b = jnp.sum((cur_b & mask_b) != mask_b) == 0
        add_a = ok & jnp.logical_not(in_a)
        new_b = in_a & jnp.logical_not(was_b)
        if cond_store:
            # a store is needed ONLY when it sets a new bit: exactly
            # add_a for A (not-all-set => some bit new) and new_b for B.
            # Steady-state batches (all keys already solid) then issue
            # zero stores.
            @pl.when(add_a)
            def _():
                a_out[pl.ds(r8a, 8), :] = cur_a | mask_a

            @pl.when(new_b)
            def _():
                b_out[pl.ds(r8b, 8), :] = cur_b | mask_b
        else:
            a_out[pl.ds(r8a, 8), :] = cur_a | jnp.where(add_a, mask_a,
                                                        zero)
            b_out[pl.ds(r8b, 8), :] = cur_b | jnp.where(in_a, mask_b,
                                                        zero)
        nb_out[i] = new_b.astype(jnp.uint32) \
            + jnp.uint32(2) * (in_a | was_b).astype(jnp.uint32)

    def seq_group(i0, _):
        # exact sequential fallback (fresh load per key)
        for g in range(G):
            i = i0 + g
            ok, r8a, r8b, mask_a, mask_b = key_state(i)
            finish(i, ok, r8a, r8b, mask_a, mask_b,
                   a_out[pl.ds(r8a, 8), :], b_out[pl.ds(r8b, 8), :])
        return 0

    def fast_group(i0, _):
        st = [key_state(i0 + g) for g in range(G)]
        cur_a = [a_out[pl.ds(s[1], 8), :] for s in st]
        cur_b = [b_out[pl.ds(s[2], 8), :] for s in st]
        for g in range(G):
            ok, r8a, r8b, mask_a, mask_b = st[g]
            finish(i0 + g, ok, r8a, r8b, mask_a, mask_b, cur_a[g],
                   cur_b[g])
        return 0

    # gb_ref: FULL bad-group bitmask (one bit per group, packed uint32;
    # full-array SMEM block — per-chunk rank-1 blocks must match the XLA
    # 1024-word tiling, which chunk/G entries don't)
    grp0 = pl.program_id(1) * (ba_ref.shape[0] // G)

    def body(grp, _):
        i0 = grp * G
        ag = (grp0 + grp).astype(jnp.uint32)
        bad = (gb_ref[(ag >> np.uint32(5)).astype(jnp.int32)]
               >> (ag & np.uint32(31))) & np.uint32(1)
        jax.lax.cond(bad != 0,
                     functools.partial(seq_group, i0),
                     functools.partial(fast_group, i0), 0)
        return 0

    jax.lax.fori_loop(0, ba_ref.shape[0] // G, body, 0)


def _kernel_sparse(live_ref, ba_ref, bb_ref, h1r_ref, h2_ref, nb_in,
                   a_in, b_in, a_out, b_out, nb_out,
                   c_ba, c_bb, c_h1r, c_h2, c_idx, *, tile_words: int,
                   n_hash_a: int, n_hash_b: int, cond_store: bool = False):
    """Sparse-mask variant: per chunk, live lanes are first COMPACTED
    into SMEM scratch with the branch-free running-cursor trick
    (unconditional `scratch[cnt] = v; cnt += live_bit` — dead lanes
    write garbage that the next live lane overwrites), then the cascade
    loop runs over exactly the live count. Per-lane @pl.when bit
    chains were measured ~6x slower per live lane (BENCH_NOTES.md).

    Used where lanes are mostly dead: the branch-node endpoint inserts
    (~1-5% live). new_b flags are scattered back to the original lane
    positions; the aliased zero buffer keeps dead lanes False."""
    tile_blocks = tile_words // 16
    base = (pl.program_id(0) * tile_blocks).astype(jnp.uint32)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 0) *
            np.uint32(_LANES) +
            jax.lax.broadcasted_iota(jnp.uint32, (8, _LANES), 1))
    n = ba_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        a_out[:] = a_in[:]

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(0) == 0))
    def _():
        b_out[:] = b_in[:]

    # NOTE on new_b dead lanes: only live (compacted) lanes are ever
    # written in phase 2, so dead lanes may hold garbage — the caller
    # masks the result with `live` on the XLA side (ADVICE r1 medium:
    # no reliance on the aliased buffer's initial content). Live lanes
    # are written by EVERY tile pass (owner tile writes the real flag,
    # other tiles read-and-rewrite), so the final value is the owner's.

    def mask_at(sub, lane0, h1r, h2, n_hash):
        m = jnp.zeros((8, _LANES), jnp.uint32)
        tbase = sub * np.uint32(_LANES) + lane0
        for j in range(n_hash):
            bit = (h1r + np.uint32(j + 1) * h2) & np.uint32(511)
            tgt = tbase + (bit >> np.uint32(5))
            m = m | jnp.where(flat == tgt,
                              jnp.uint32(1) << (bit & np.uint32(31)),
                              np.uint32(0))
        return m

    # ---- phase 1: branch-free compaction of live lanes ------------------
    base_w = pl.program_id(1) * (n // 32)

    def compact_word(w, cnt):
        lw = live_ref[base_w + w]

        def lane(j, cnt):
            i = w * 32 + j
            c_ba[cnt] = ba_ref[i]
            c_bb[cnt] = bb_ref[i]
            c_h1r[cnt] = h1r_ref[i]
            c_h2[cnt] = h2_ref[i]
            c_idx[cnt] = jnp.uint32(i)
            return cnt + ((lw >> j.astype(jnp.uint32)) & 1).astype(
                jnp.int32)

        # one branch per 32 lanes is cheap (unlike per-lane predication)
        # and makes ultra-sparse masks (~1% live) near-free
        return jax.lax.cond(lw != 0,
                            lambda c: jax.lax.fori_loop(0, 32, lane, c),
                            lambda c: c, cnt)

    cnt = jax.lax.fori_loop(0, n // 32, compact_word,
                            jnp.zeros((), jnp.int32))

    # ---- phase 2: two-phase groups over the cnt compacted lanes ---------
    # Same structure as _kernel_v2 (loads pipelined across the group, one
    # store->load stall per group), but the group-bad check runs IN-KERNEL
    # on scalars: compaction order is data-dependent, so no XLA precompute
    # can see which keys land in a group. Lanes at/past cnt hold stale
    # scratch garbage and are neutralized via `valid`.
    G = 8
    zero = np.uint32(0)

    def group(grp, _):
        i0 = grp * G
        meta = []
        for g in range(G):
            i = i0 + g
            valid = i < cnt
            blk_a = jnp.where(valid, c_ba[i], SENTINEL)
            blk_b = jnp.where(valid, c_bb[i], zero)
            rel = blk_a - base
            ok = valid & (blk_a != SENTINEL) & (rel < tile_blocks)
            rel_c = jnp.where(ok, rel, zero)
            h1r = c_h1r[i]
            h2 = c_h2[i]
            idx = jnp.where(valid, c_idx[i], zero)
            meta.append((ok, rel_c, blk_b, h1r, h2, idx))
        wa = [jnp.where(m[0], m[1] >> np.uint32(6), zero) for m in meta]
        wb = [m[2] >> np.uint32(6) for m in meta]
        bad = meta[0][0] & False
        for gj in range(G):
            for gi in range(gj):
                clash = (wa[gi] == wa[gj]) | (wb[gi] == wb[gj])
                bad = bad | (clash & (meta[gi][0] | meta[gj][0]))

        def one(g, cur_a, cur_b):
            ok, rel_c, blk_b, h1r, h2, idx = meta[g]
            r8a, sub_a, lane0a = _window(rel_c)
            r8b, sub_b, lane0b = _window(blk_b)
            mask_a = mask_at(sub_a, lane0a, h1r, h2, n_hash_a)
            mask_b = mask_at(sub_b, lane0b, h1r, h2, n_hash_b)
            in_a = ok & (jnp.sum((cur_a & mask_a) != mask_a) == 0)
            was_b = jnp.sum((cur_b & mask_b) != mask_b) == 0
            add_a = ok & jnp.logical_not(in_a)
            new_b = in_a & jnp.logical_not(was_b)
            if cond_store:
                @pl.when(add_a)
                def _():
                    a_out[pl.ds(r8a, 8), :] = cur_a | mask_a

                @pl.when(new_b)
                def _():
                    b_out[pl.ds(r8b, 8), :] = cur_b | mask_b
            else:
                a_out[pl.ds(r8a, 8), :] = cur_a | jnp.where(add_a, mask_a,
                                                            zero)
                b_out[pl.ds(r8b, 8), :] = cur_b | jnp.where(in_a, mask_b,
                                                            zero)
            old = nb_out[idx]
            packed = new_b.astype(jnp.uint32) \
                + jnp.uint32(2) * (in_a | was_b).astype(jnp.uint32)
            nb_out[idx] = jnp.where(ok, packed, old)

        def windows(g):
            ok, rel_c, blk_b = meta[g][0], meta[g][1], meta[g][2]
            r8a, _, _ = _window(rel_c)
            r8b, _, _ = _window(blk_b)
            return r8a, r8b

        def seq_path(_):
            for g in range(G):
                r8a, r8b = windows(g)
                one(g, a_out[pl.ds(r8a, 8), :], b_out[pl.ds(r8b, 8), :])
            return 0

        def fast_path(_):
            rows = [windows(g) for g in range(G)]
            cur_a = [a_out[pl.ds(r8a, 8), :] for r8a, _ in rows]
            cur_b = [b_out[pl.ds(r8b, 8), :] for _, r8b in rows]
            for g in range(G):
                one(g, cur_a[g], cur_b[g])
            return 0

        jax.lax.cond(bad, seq_path, fast_path, 0)
        return 0

    jax.lax.fori_loop(0, (cnt + G - 1) // G, group, 0)


def _group_bad(block_a: jnp.ndarray, block_b: jnp.ndarray, G: int
               ) -> jnp.ndarray:
    """uint32[N/G] flag per group of G keys: 1 iff two keys of the group
    touch the same aligned (8,128) window in filter A or in filter B
    (incl. a dead lane's clamped-to-0 writeback against a live lane).
    Flagged groups take _kernel_v2's exact sequential path."""
    live = block_a != SENTINEL
    wa = (jnp.where(live, block_a, np.uint32(0)) >> np.uint32(6)
          ).reshape(-1, G)
    wb = (block_b >> np.uint32(6)).reshape(-1, G)
    lv = live.reshape(-1, G)
    either = lv[:, :, None] | lv[:, None, :]
    tri = jnp.asarray(np.triu(np.ones((G, G), bool), 1))
    hit = ((wa[:, :, None] == wa[:, None, :]) |
           (wb[:, :, None] == wb[:, None, :])) & either & tri
    bad = jnp.any(hit, axis=(1, 2))
    # pack to one bit per group (padded so the words reshape evenly);
    # passed as a FULL-array SMEM block, which always matches XLA tiling
    padg = (-bad.shape[0]) % 32
    if padg:
        bad = jnp.concatenate([bad, jnp.zeros((padg,), bool)])
    return (bad.reshape(-1, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)


def _pick_tile_words(wa: int, wb: int) -> int:
    budget_words = _VMEM_BUDGET // 4 - wb  # aliased in/out: count once
    if wa <= budget_words:
        return wa
    tile = 1 << 22  # start at 16 MB
    while tile > budget_words or wa % tile:
        tile >>= 1
    assert tile >= 4096, (wa, wb)
    return tile


@functools.partial(jax.jit, static_argnames=("n_hash_a", "n_hash_b",
                                             "sparse", "tile_override",
                                             "group", "two_phase",
                                             "cond_store", "with_solid",
                                             "interpret"))
def cascade_insert_fused(a_words: jnp.ndarray, b_words: jnp.ndarray,
                         block_a: jnp.ndarray, block_b: jnp.ndarray,
                         h1r: jnp.ndarray, h2: jnp.ndarray, n_hash_a: int,
                         n_hash_b: int = None, live: jnp.ndarray = None,
                         sparse: bool = False, tile_override: int = None,
                         group: int = None, two_phase: bool = True,
                         cond_store: bool = False, with_solid: bool = False,
                         interpret: bool = False):
    """For each key (stream order): if A has all its bits, set them in B,
    else set them in A. block_a == SENTINEL skips the key. Returns the
    updated (a_words, b_words, new_b) where new_b[i] marks keys whose B
    bits were not all set before this insert (first promotion — drives
    the branch-node cascade of core/nodes.py).

    sparse=True: `live` is a bool[N] expected mostly-False; live lanes
    are compacted in-kernel and new_b flags are scattered back to their
    original lane positions (dead lanes report False). block_a must
    already be SENTINEL where not live."""
    if n_hash_b is None:
        n_hash_b = n_hash_a
    wa, wb = a_words.shape[0], b_words.shape[0]
    assert wa % _LANES == 0 and wb % _LANES == 0
    tile_words = tile_override or _pick_tile_words(wa, wb)
    n_tiles = wa // tile_words
    n = block_a.shape[0]
    chunk = min(_KEY_CHUNK, max(((n + 31) // 32) * 32, 32))
    pad = (-n) % chunk
    if pad:
        fill = lambda a, v: jnp.concatenate(
            [a, jnp.full((pad,), v, jnp.uint32)])
        block_a, block_b, h1r, h2 = (fill(block_a, SENTINEL),
                                     fill(block_b, 0), fill(h1r, 0),
                                     fill(h2, 0))
    n_chunks = block_a.shape[0] // chunk

    spec_s = pl.BlockSpec((chunk,), lambda t, c: (c,),
                          memory_space=pltpu.SMEM)
    spec_a = pl.BlockSpec((tile_words // _LANES, _LANES),
                          lambda t, c: (t, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((wb // _LANES, _LANES), lambda t, c: (0, 0),
                          memory_space=pltpu.VMEM)

    if sparse:
        lv = live
        if pad:
            lv = jnp.concatenate([lv, jnp.zeros((pad,), bool)])
        words32 = (lv.reshape(-1, 32).astype(jnp.uint32)
                   << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                       axis=1, dtype=jnp.uint32)
        # whole packed-mask array as ONE SMEM block (rank-1 SMEM blocks
        # must match the array's XLA tiling; full-array blocks always do)
        spec_l = pl.BlockSpec((words32.shape[0],), lambda t, c: (0,),
                              memory_space=pltpu.SMEM)
        nb0 = jnp.zeros((block_a.shape[0],), jnp.uint32)
        a_out, b_out, new_b = pl.pallas_call(
            functools.partial(_kernel_sparse, tile_words=tile_words,
                              n_hash_a=n_hash_a, n_hash_b=n_hash_b,
                              cond_store=cond_store),
            grid=(n_tiles, n_chunks),
            in_specs=[spec_l, spec_s, spec_s, spec_s, spec_s, spec_s,
                      spec_a, spec_b],
            out_specs=(spec_a, spec_b, spec_s),
            out_shape=(
                jax.ShapeDtypeStruct((wa // _LANES, _LANES), jnp.uint32),
                jax.ShapeDtypeStruct((wb // _LANES, _LANES), jnp.uint32),
                jax.ShapeDtypeStruct((block_a.shape[0],), jnp.uint32)),
            scratch_shapes=[pltpu.SMEM((chunk,), jnp.uint32)
                            for _ in range(5)],
            input_output_aliases={5: 2, 6: 0, 7: 1},
            interpret=interpret,
        )(words32, block_a, block_b, h1r, h2, nb0,
          a_words.reshape(wa // _LANES, _LANES),
          b_words.reshape(wb // _LANES, _LANES))
        # dead lanes are never written by the kernel: mask them here
        # instead of relying on aliased-buffer zero-init (ADVICE r1)
        raw = (new_b[:n] if pad else new_b)
        if with_solid:
            return (a_out.reshape(wa), b_out.reshape(wb),
                    ((raw & 1) > 0) & live, ((raw & 2) > 0) & live)
        return (a_out.reshape(wa), b_out.reshape(wb),
                ((raw & 1) > 0) & live)

    nb0 = jnp.zeros((block_a.shape[0],), jnp.uint32)
    if n_tiles == 1 and two_phase:
        # two-phase group kernel: loads pipelined across the group,
        # store->load stall paid once per group; same-window groups
        # (flagged by the XLA precompute) replay sequentially
        # G=16 measured fastest on the 573k-key load (round-4 tune4:
        # 28.1 ms vs 30.1 at G=8, 46.2 at G=32 — wider groups pipeline
        # more loads per store stall until the bad-group replay rate and
        # register pressure win)
        G = group or 16
        assert chunk % G == 0, (chunk, G)
        gb = _group_bad(block_a, block_b, G)
        spec_g = pl.BlockSpec((gb.shape[0],), lambda t, c: (0,),
                              memory_space=pltpu.SMEM)
        a_out, b_out, new_b = pl.pallas_call(
            functools.partial(_kernel_v2, tile_words=tile_words,
                              n_hash_a=n_hash_a, n_hash_b=n_hash_b, G=G,
                              cond_store=cond_store),
            grid=(1, n_chunks),
            in_specs=[spec_g, spec_s, spec_s, spec_s, spec_s, spec_s,
                      spec_a, spec_b],
            out_specs=(spec_a, spec_b, spec_s),
            out_shape=(
                jax.ShapeDtypeStruct((wa // _LANES, _LANES), jnp.uint32),
                jax.ShapeDtypeStruct((wb // _LANES, _LANES), jnp.uint32),
                jax.ShapeDtypeStruct((block_a.shape[0],), jnp.uint32)),
            input_output_aliases={5: 2, 6: 0, 7: 1},
            interpret=interpret,
        )(gb, block_a, block_b, h1r, h2, nb0,
          a_words.reshape(wa // _LANES, _LANES),
          b_words.reshape(wb // _LANES, _LANES))
        raw = (new_b[:n] if pad else new_b)
        if with_solid:
            return (a_out.reshape(wa), b_out.reshape(wb),
                    (raw & 1) > 0, (raw & 2) > 0)
        return (a_out.reshape(wa), b_out.reshape(wb), (raw & 1) > 0)
    a_out, b_out, new_b = pl.pallas_call(
        functools.partial(_kernel, tile_words=tile_words,
                          n_hash_a=n_hash_a, n_hash_b=n_hash_b,
                          n_tiles=n_tiles, group=group),
        grid=(n_tiles, n_chunks),
        in_specs=[spec_s, spec_s, spec_s, spec_s, spec_s, spec_a, spec_b],
        out_specs=(spec_a, spec_b, spec_s),
        out_shape=(jax.ShapeDtypeStruct((wa // _LANES, _LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((wb // _LANES, _LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((block_a.shape[0],), jnp.uint32)),
        input_output_aliases={4: 2, 5: 0, 6: 1},
        interpret=interpret,
    )(block_a, block_b, h1r, h2, nb0,
      a_words.reshape(wa // _LANES, _LANES),
      b_words.reshape(wb // _LANES, _LANES))
    raw = (new_b[:n] if pad else new_b)
    if with_solid:
        return (a_out.reshape(wa), b_out.reshape(wb),
                (raw & 1) > 0, (raw & 2) > 0)
    return (a_out.reshape(wa), b_out.reshape(wb), (raw & 1) > 0)
