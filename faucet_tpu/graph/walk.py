"""Device frontier walk: lockstep contig reconstruction through filter B.

Reference analogue: the BF path walker / contig-spawning walks of
ref:src/JunctionMap.cpp + ref:src/ContigGraph.cpp (SURVEY.md §2.1 "BF path
walker", §3.5 [C:med]). The reference chases one path at a time; here ALL
walks advance in lockstep — each step is one batched 4-way solidity probe
plus one batched junction-table lookup over the whole frontier
(SURVEY.md §7.1.4 "graph phase as iterative frontier kernels"), with
per-walk masks retiring finished lanes. Rounds of a static step count keep
shapes fixed; the host loops rounds until the frontier drains.

End kinds: 0 running, 1 hit junction, 2 dead end (no solid extension),
3 circular (returned to start k-mer), 4 ambiguous (>=2 solid extensions at
a non-junction — only reachable via Bloom false positives; treated as a
dead end and trimmed by dist).
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
from faucet_tpu.core.slots import entry_slot

I32 = jnp.int32

RUNNING, END_JUNCTION, END_DEAD, END_CIRCULAR, END_AMBIG = range(5)


class Frontier(NamedTuple):
    fhi: jnp.ndarray   # current travel-frame forward code [W]
    flo: jnp.ndarray
    rhi: jnp.ndarray   # current travel-frame revcomp code
    rlo: jnp.ndarray
    t0hi: jnp.ndarray  # start travel-frame forward code (circle check)
    t0lo: jnp.ndarray
    forced: jnp.ndarray      # int32: first base to take, -1 = free choice
    circle_ok: jnp.ndarray   # bool: detect return-to-start (sink walks);
    #                          junction walks end at the table hit instead
    active: jnp.ndarray      # bool
    end_kind: jnp.ndarray    # int32
    entry_slot: jnp.ndarray  # int32, valid when end_kind == END_JUNCTION
    steps: jnp.ndarray       # int32 bases appended


def make_frontier(chi, clo, rchi, rclo, dirs, forced, active,
                  circle_ok) -> Frontier:
    """Seeds: canonical codes + their revcomp codes; dirs 0 = travel in
    canonical orientation, 1 = travel in revcomp orientation."""
    fhi, flo = u2.select(dirs == 0, chi, clo, rchi, rclo)
    rhi, rlo = u2.select(dirs == 0, rchi, rclo, chi, clo)
    n = chi.shape[0]
    return Frontier(
        fhi=fhi, flo=flo, rhi=rhi, rlo=rlo, t0hi=fhi, t0lo=flo,
        forced=jnp.asarray(forced, I32),
        circle_ok=jnp.asarray(circle_ok, bool),
        active=jnp.asarray(active, bool),
        end_kind=jnp.full((n,), RUNNING, I32),
        entry_slot=jnp.full((n,), -1, I32),
        steps=jnp.zeros((n,), I32))


def _top_base(fhi, flo, k: int):
    bitpos = 2 * (k - 1)
    if bitpos >= 32:
        return ((fhi >> np.uint32(bitpos - 32)) & np.uint32(3)).astype(I32)
    return ((flo >> np.uint32(bitpos)) & np.uint32(3)).astype(I32)


def walk_round(cascade: BL.Cascade, junctions: T.Table, fr: Frontier,
               n_steps: int, cfg) -> Tuple[Frontier, jnp.ndarray]:
    """Advance every active walk by up to n_steps bases.

    Returns (frontier, bases uint8[W, n_steps]; 255 where lane inactive).
    """
    k = cfg.size_kmer

    def step(fr: Frontier, _):
        a = fr.active
        # 4-way right-extension probe in travel frame
        sols = []
        exts = []
        for b in range(4):
            e = KM.right_ext(fr.fhi, fr.flo, fr.rhi, fr.rlo,
                             np.uint32(b), k)
            chi, clo, _ = KM.canon_of(*e)
            sols.append(BL.cascade_solid(cascade, chi, clo, a, cfg))
            exts.append(e)
        solid4 = jnp.stack(sols, axis=-1)            # [W, 4]
        cnt = jnp.sum(solid4, axis=-1)
        free = a & (fr.forced < 0)
        dead = free & (cnt == 0)
        ambig = free & (cnt >= 2)
        bsel = jnp.where(fr.forced >= 0, fr.forced,
                         jnp.argmax(solid4, axis=-1).astype(I32))
        advance = a & ~dead & ~ambig

        pbase = _top_base(fr.fhi, fr.flo, k)
        nfhi, nflo, nrhi, nrlo = KM.right_ext(
            fr.fhi, fr.flo, fr.rhi, fr.rlo, bsel.astype(jnp.uint32), k)
        fhi = jnp.where(advance, nfhi, fr.fhi)
        flo = jnp.where(advance, nflo, fr.flo)
        rhi = jnp.where(advance, nrhi, fr.rhi)
        rlo = jnp.where(advance, nrlo, fr.rlo)

        circ = advance & fr.circle_ok & (fhi == fr.t0hi) & (flo == fr.t0lo)
        chi, clo, cisf = KM.canon_of(fhi, flo, rhi, rlo)
        at_junc = T.lookup(junctions, chi, clo, advance & ~circ,
                           shard_bits=cfg.shard_bits)[0]
        eslot = entry_slot(cisf, pbase)

        end_kind = fr.end_kind
        end_kind = jnp.where(dead, END_DEAD, end_kind)
        end_kind = jnp.where(ambig, END_AMBIG, end_kind)
        end_kind = jnp.where(circ, END_CIRCULAR, end_kind)
        end_kind = jnp.where(at_junc, END_JUNCTION, end_kind)
        entry = jnp.where(at_junc, eslot, fr.entry_slot)
        active = a & ~dead & ~ambig & ~circ & ~at_junc
        out_base = jnp.where(advance, bsel, 255).astype(jnp.uint8)
        new = Frontier(
            fhi=fhi, flo=flo, rhi=rhi, rlo=rlo,
            t0hi=fr.t0hi, t0lo=fr.t0lo,
            forced=jnp.full_like(fr.forced, -1),
            circle_ok=fr.circle_ok,
            active=active, end_kind=end_kind, entry_slot=entry,
            steps=fr.steps + advance.astype(I32))
        return new, out_base

    fr, bases = jax.lax.scan(step, fr, None, length=n_steps)
    return fr, bases.T  # [W, n_steps]


def resolve_ambiguous(cascade: BL.Cascade, fr: Frontier, cfg) -> Frontier:
    """Re-arm walks retired on Bloom-fp branches via 1-step lookahead.

    Reference analogue: the BF walk's fp-branch tolerance — "exactly one
    should be solid (else: FP-branch — resolved by bound dist / endpoint
    match)" (SURVEY.md §3.5 [C:med]). A false-positive k-mer almost never
    extends (P ~ 4*fp), so at an ambiguous step the candidate with a
    solid continuation is the real path; walks resume with that base
    forced. Runs between rounds over the whole frontier with lookahead
    probes masked to the ambiguous lanes (the probe kernel skips masked
    lanes), so the per-step hot loop stays 4 probes."""
    k = cfg.size_kmer
    amb = (fr.end_kind == END_AMBIG) & ~fr.active
    strongs = []
    for b in range(4):
        e = KM.right_ext(fr.fhi, fr.flo, fr.rhi, fr.rlo, np.uint32(b), k)
        chi, clo, _ = KM.canon_of(*e)
        sb = BL.cascade_solid(cascade, chi, clo, amb, cfg)
        cont = jnp.zeros_like(sb)
        for b2 in range(4):
            e2 = KM.right_ext(*e, np.uint32(b2), k)
            c2h, c2l, _ = KM.canon_of(*e2)
            cont = cont | BL.cascade_solid(cascade, c2h, c2l, sb, cfg)
        strongs.append(sb & cont)
    strong4 = jnp.stack(strongs, axis=-1)
    scnt = jnp.sum(strong4, axis=-1)
    resolved = amb & (scnt == 1)
    return fr._replace(
        forced=jnp.where(resolved,
                         jnp.argmax(strong4, axis=-1).astype(I32),
                         fr.forced),
        active=fr.active | resolved,
        end_kind=jnp.where(resolved, RUNNING, fr.end_kind))


# ---- wide (k > 31) frontier: 4-word codes, fingerprint keys ------------


class FrontierW(NamedTuple):
    fwd: Tuple[jnp.ndarray, ...]   # 4 x [W] travel-frame forward code
    rc: Tuple[jnp.ndarray, ...]
    t0: Tuple[jnp.ndarray, ...]    # start travel-frame code (circles)
    forced: jnp.ndarray
    circle_ok: jnp.ndarray
    active: jnp.ndarray
    end_kind: jnp.ndarray
    entry_slot: jnp.ndarray
    steps: jnp.ndarray


def make_frontier_wide(cwords, rcwords, dirs, forced, active,
                       circle_ok) -> FrontierW:
    from faucet_tpu.core import wide as WD

    fwd = WD.wselect(dirs == 0, cwords, rcwords)
    rc = WD.wselect(dirs == 0, rcwords, cwords)
    n = fwd[0].shape[0]
    return FrontierW(
        fwd=fwd, rc=rc, t0=fwd,
        forced=jnp.asarray(forced, I32),
        circle_ok=jnp.asarray(circle_ok, bool),
        active=jnp.asarray(active, bool),
        end_kind=jnp.full((n,), RUNNING, I32),
        entry_slot=jnp.full((n,), -1, I32),
        steps=jnp.zeros((n,), I32))


def walk_round_wide(cascade: BL.Cascade, junctions: T.Table,
                    fr: FrontierW, n_steps: int, cfg
                    ) -> Tuple[FrontierW, jnp.ndarray]:
    from faucet_tpu.core import wide as WD

    k = cfg.size_kmer

    def step(fr: FrontierW, _):
        a = fr.active
        sols = []
        for b in range(4):
            nf, nr = WD.right_ext_wide(fr.fwd, fr.rc, np.uint32(b), k)
            c, _ = WD.canon_of_wide(nf, nr)
            khi, klo = WD.fingerprint(c)
            sols.append(BL.cascade_solid(cascade, khi, klo, a, cfg))
        solid4 = jnp.stack(sols, axis=-1)
        cnt = jnp.sum(solid4, axis=-1)
        free = a & (fr.forced < 0)
        dead = free & (cnt == 0)
        ambig = free & (cnt >= 2)
        bsel = jnp.where(fr.forced >= 0, fr.forced,
                         jnp.argmax(solid4, axis=-1).astype(I32))
        advance = a & ~dead & ~ambig

        pbase = WD.wtop_base(fr.fwd, k)
        nf, nr = WD.right_ext_wide(fr.fwd, fr.rc, bsel.astype(jnp.uint32),
                                   k)
        fwd = WD.wselect(advance, nf, fr.fwd)
        rc = WD.wselect(advance, nr, fr.rc)

        circ = advance & fr.circle_ok & WD.weq(fwd, fr.t0)
        canon, cisf = WD.canon_of_wide(fwd, rc)
        khi, klo = WD.fingerprint(canon)
        at_junc = T.lookup(junctions, khi, klo, advance & ~circ,
                           shard_bits=cfg.shard_bits)[0]
        eslot = entry_slot(cisf, pbase)

        end_kind = fr.end_kind
        end_kind = jnp.where(dead, END_DEAD, end_kind)
        end_kind = jnp.where(ambig, END_AMBIG, end_kind)
        end_kind = jnp.where(circ, END_CIRCULAR, end_kind)
        end_kind = jnp.where(at_junc, END_JUNCTION, end_kind)
        entry = jnp.where(at_junc, eslot, fr.entry_slot)
        active = a & ~dead & ~ambig & ~circ & ~at_junc
        out_base = jnp.where(advance, bsel, 255).astype(jnp.uint8)
        new = FrontierW(
            fwd=fwd, rc=rc, t0=fr.t0,
            forced=jnp.full_like(fr.forced, -1),
            circle_ok=fr.circle_ok, active=active, end_kind=end_kind,
            entry_slot=entry, steps=fr.steps + advance.astype(I32))
        return new, out_base

    fr, bases = jax.lax.scan(step, fr, None, length=n_steps)
    return fr, bases.T


def resolve_ambiguous_wide(cascade: BL.Cascade, fr: FrontierW, cfg
                           ) -> FrontierW:
    """Wide-code twin of resolve_ambiguous (same fp-branch lookahead)."""
    from faucet_tpu.core import wide as WD

    k = cfg.size_kmer
    amb = (fr.end_kind == END_AMBIG) & ~fr.active
    strongs = []
    for b in range(4):
        nf, nr = WD.right_ext_wide(fr.fwd, fr.rc, np.uint32(b), k)
        c, _ = WD.canon_of_wide(nf, nr)
        khi, klo = WD.fingerprint(c)
        sb = BL.cascade_solid(cascade, khi, klo, amb, cfg)
        cont = jnp.zeros_like(sb)
        for b2 in range(4):
            nf2, nr2 = WD.right_ext_wide(nf, nr, np.uint32(b2), k)
            c2, _ = WD.canon_of_wide(nf2, nr2)
            k2h, k2l = WD.fingerprint(c2)
            cont = cont | BL.cascade_solid(cascade, k2h, k2l, sb, cfg)
        strongs.append(sb & cont)
    strong4 = jnp.stack(strongs, axis=-1)
    scnt = jnp.sum(strong4, axis=-1)
    resolved = amb & (scnt == 1)
    return fr._replace(
        forced=jnp.where(resolved,
                         jnp.argmax(strong4, axis=-1).astype(I32),
                         fr.forced),
        active=fr.active | resolved,
        end_kind=jnp.where(resolved, RUNNING, fr.end_kind))
