"""Phase-2 device scan: dense junction detection over read batches.

Reference analogue: ref:src/ReadScanner.{h,cpp} `scanReads`/`scanInputRead`
(SURVEY.md §2.1, §3.2 [C:high]). The reference hops junction-to-junction
per read, skipping linear stretches via stored distances — a latency
optimization for a serial CPU. On TPU we invert the design (SURVEY.md
§7.1.1): probe EVERY window of EVERY read against solid filter B in one
batched 8-way extension probe; junction-ness is then a pure function of
(k-mer, B), so the dense scan and the reference's sequential scan agree on
the junction set by construction.

Per batch:
  1. kmerize -> per-window canonical codes           [B, P]
  2. solidity probe of windows and their 8 slot-extensions
  3. segment rows into maximal solid runs (two lax.scans over P)
  4. junction records: per-slot cov (+1 per observed traversal) and dist
     (max bases to next junction / run end) -> batched table upsert
  5. runs containing no junction contribute their two end k-mers as sink
     anchors (SURVEY.md §A.4 caps)
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from faucet_tpu.core import bloom as BL
from faucet_tpu.core import kmer as KM
from faucet_tpu.core import table as T
from faucet_tpu.core import u32x2 as u2
from faucet_tpu.core.slots import entry_slot, exit_slot

I32 = jnp.int32


class ScanResult(NamedTuple):
    junctions: T.Table
    sinks: T.Table
    n_solid: jnp.ndarray      # solid windows in batch
    n_junc_pos: jnp.ndarray   # junction-window observations in batch
    jm: jnp.ndarray           # [B, P] junction mask (consumed by pairs)
    canon_hi: jnp.ndarray     # [B, P] (consumed by pairs)
    canon_lo: jnp.ndarray


def _row_runs(solid, is_junc):
    """Per-row maximal solid-run bookkeeping via two scans over P.

    Returns (run_start_idx, run_end_idx, prev_junc_idx, next_junc_idx,
    run_junc_total), all [B, P] int32; *_junc_idx are -1 when absent,
    strictly before/after the position within its run.
    """
    B, P = solid.shape
    prev_solid = jnp.pad(solid[:, :-1], ((0, 0), (1, 0)))
    next_solid = jnp.pad(solid[:, 1:], ((0, 0), (0, 1)))
    start_m = solid & ~prev_solid
    end_m = solid & ~next_solid

    def fstep(carry, x):
        rs, pj, cnt = carry
        sol, jn, st, p = x
        rs = jnp.where(st, p, rs)
        pj = jnp.where(st, -1, pj)
        cnt = jnp.where(st, 0, cnt)
        out = (rs, pj)
        pj = jnp.where(jn, p, pj)
        cnt = cnt + jn.astype(I32)
        return (rs, pj, cnt), out + (cnt,)

    ps = jnp.arange(P, dtype=I32)[:, None] * jnp.ones((1, B), I32)
    init = (jnp.zeros((B,), I32), jnp.full((B,), -1, I32),
            jnp.zeros((B,), I32))
    _, (rs, pj, cnt_incl) = jax.lax.scan(
        fstep, init, (solid.T, is_junc.T, start_m.T, ps))

    def bstep(carry, x):
        re, nj, tot = carry
        jn, en, ci, p = x
        re = jnp.where(en, p, re)
        nj = jnp.where(en, -1, nj)
        tot = jnp.where(en, ci, tot)
        out = (re, nj, tot)
        nj = jnp.where(jn, p, nj)
        return (re, nj, tot), out

    init = (jnp.zeros((B,), I32), jnp.full((B,), -1, I32),
            jnp.zeros((B,), I32))
    _, (re, nj, tot) = jax.lax.scan(
        bstep, init, (is_junc.T, end_m.T, cnt_incl, ps), reverse=True)

    tr = lambda a: a.T  # [P, B] -> [B, P]
    return tr(rs), tr(re), tr(pj), tr(nj), tr(tot), start_m, end_m


def scan_batch(cascade: BL.Cascade, junctions: T.Table, sinks: T.Table,
               bases, lens, cfg) -> ScanResult:
    k = cfg.size_kmer
    view = KM.kmerize(bases, lens, k)
    B, P = view.canon_hi.shape

    solid = BL.cascade_solid(cascade, view.canon_hi, view.canon_lo,
                             view.valid, cfg)
    other_hi, other_lo = u2.select(view.canon_is_fwd, view.rc_hi,
                                   view.rc_lo, view.fwd_hi, view.fwd_lo)
    ehi, elo = KM.slot_ext_pairs(view.canon_hi, view.canon_lo,
                                 other_hi, other_lo, k)
    ext_solid = BL.cascade_solid(
        cascade, ehi, elo, jnp.broadcast_to(solid[..., None], ehi.shape),
        cfg)
    right_deg = jnp.sum(ext_solid[..., 0:4], axis=-1)
    left_deg = jnp.sum(ext_solid[..., 4:8], axis=-1)
    is_junc = solid & ((right_deg >= 2) | (left_deg >= 2))

    rs, re, pj, nj, tot, start_m, end_m = _row_runs(solid, is_junc)
    pos = jnp.arange(P, dtype=I32)[None, :]

    # neighbor read bases (codes) just outside each window
    nb = jnp.pad(bases[:, k:], ((0, 0), (0, max(0, P - (bases.shape[1] - k)))),
                 constant_values=4)[:, :P]
    pb = jnp.pad(bases[:, : P - 1], ((0, 0), (1, 0)), constant_values=4)

    exit_ok = is_junc & ~end_m
    entry_ok = is_junc & ~start_m
    ex_slot = exit_slot(view.canon_is_fwd, jnp.minimum(nb, 3).astype(I32))
    en_slot = entry_slot(view.canon_is_fwd, jnp.minimum(pb, 3).astype(I32))
    ex_dist = (jnp.where(nj >= 0, nj, re) - pos).astype(I32)
    en_dist = (pos - jnp.where(pj >= 0, pj, rs)).astype(I32)

    ex_oh = jax.nn.one_hot(ex_slot, 8, dtype=I32) * exit_ok[..., None]
    en_oh = jax.nn.one_hot(en_slot, 8, dtype=I32) * entry_ok[..., None]
    cov8 = ex_oh + en_oh
    dist8 = jnp.maximum(ex_oh * ex_dist[..., None],
                        en_oh * en_dist[..., None]).astype(jnp.uint16)

    flat = lambda a: a.reshape((B * P,) + a.shape[2:])
    junctions = T.upsert(junctions, flat(view.canon_hi),
                         flat(view.canon_lo), (flat(cov8), flat(dist8)),
                         flat(is_junc), modes=("add", "max"))

    sink_pos = solid & (tot == 0) & (start_m | end_m)
    sink_cov = (start_m.astype(I32) + end_m.astype(I32))
    sinks = T.upsert(sinks, flat(view.canon_hi), flat(view.canon_lo),
                     (flat(sink_cov),), flat(sink_pos), modes=("add",))

    return ScanResult(
        junctions=junctions, sinks=sinks,
        n_solid=jnp.sum(solid, dtype=I32),
        n_junc_pos=jnp.sum(is_junc, dtype=I32),
        jm=is_junc, canon_hi=view.canon_hi, canon_lo=view.canon_lo)


def load_batch(cascade: BL.Cascade, bases, lens, cfg) -> BL.Cascade:
    """Phase-1 cascade load of every valid window of the batch."""
    view = KM.kmerize(bases, lens, cfg.size_kmer)
    B, P = view.canon_hi.shape
    return BL.cascade_insert(
        cascade, view.canon_hi.reshape(-1), view.canon_lo.reshape(-1),
        view.valid.reshape(-1), cfg)
