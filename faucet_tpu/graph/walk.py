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
3 circular (returned to start k-mer), 4 ambiguous (>=2 solid extensions
at a non-junction: an error/fp branch or a shadow-missed junction).
AMBIG is transient — the capped resolver (resolve_ambiguous) judges
each such retirement exactly once, re-arming the lane or converting it
to END_DEAD; unjudged AMBIG lanes count as pending work for the wave
loop and the compaction driver.
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

# resolver lane cap floor: ambiguity events per round are sparse
# (error/fp branches), so the resolver gathers a bounded lane set; the
# rest stay END_AMBIG ("pending") and are picked up next round. The
# effective cap scales with the frontier (_resolve_cap) — a fixed 1024
# drain rate let tens of thousands of simultaneous early retirements
# pool as pending at 8 Mbp scale, blocking frontier compaction and
# dragging the full grid through extra wave calls (906 s of a measured
# 8 Mbp pass-1).
RESOLVE_CAP = 1024


def _resolve_cap(n: int) -> int:
    return int(min(n, max(RESOLVE_CAP, n // 8)))


def _scatter_resolved(fr, lanes, amb, resolved, forced_new):
    """Scatter a compacted resolver verdict back to the full frontier:
    resolved lanes re-arm with their forced base; processed-but-
    unresolved lanes retire END_DEAD (a repeat resolve is deterministic
    rework — each AMBIG event is judged exactly once)."""
    n = fr.forced.shape[0]
    res_full = jnp.zeros((n,), bool).at[lanes].set(resolved)
    proc_full = jnp.zeros((n,), bool).at[lanes].set(amb)
    forced_full = jnp.zeros_like(fr.forced).at[lanes].set(forced_new)
    return fr._replace(
        forced=jnp.where(res_full, forced_full, fr.forced),
        active=fr.active | res_full,
        end_kind=jnp.where(
            res_full, RUNNING,
            jnp.where(proc_full & (fr.end_kind == END_AMBIG),
                      END_DEAD, fr.end_kind)))


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
               n_steps: int, cfg, solid_fn=None, junc_fn=None
               ) -> Tuple[Frontier, jnp.ndarray]:
    """Advance every active walk by up to n_steps bases.

    Returns (frontier, bases uint8[W, n_steps]; 255 where lane inactive).

    solid_fn/junc_fn: injectable membership/junction oracles — the
    owner-routed sharded walk (dist/swalk.py) replaces the local probes
    with dist/route.py round trips, same signatures as scan_core's.
    """
    k = cfg.size_kmer
    if solid_fn is None:
        solid_fn = lambda chi, clo, m: BL.cascade_solid(cascade, chi,
                                                        clo, m, cfg)
    if junc_fn is None:
        junc_fn = lambda chi, clo, m: T.lookup(
            junctions, chi, clo, m, shard_bits=cfg.shard_bits)[0]

    def step(fr: Frontier, _):
        a = fr.active
        # 4-way right-extension probe in travel frame (one stacked call:
        # locally one kernel launch, sharded one routing round)
        exts = [KM.right_ext(fr.fhi, fr.flo, fr.rhi, fr.rlo,
                             np.uint32(b), k) for b in range(4)]
        cc = [KM.canon_of(*e) for e in exts]
        qhi = jnp.stack([c[0] for c in cc])
        qlo = jnp.stack([c[1] for c in cc])
        solid4 = solid_fn(qhi, qlo,
                          jnp.broadcast_to(a, qhi.shape)).T  # [W, 4]
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
        at_junc = junc_fn(chi, clo, advance & ~circ)
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


def resolve_ambiguous(cascade: BL.Cascade, fr: Frontier, cfg,
                      solid_fn=None) -> Frontier:
    """Re-arm walks retired on Bloom-fp branches via deep greedy lookahead.

    Reference analogue: the BF walk's fp-branch tolerance — "exactly one
    should be solid (else: FP-branch — resolved by bound dist / endpoint
    match)" (SURVEY.md §3.5 [C:med]). At an ambiguous step each solid
    candidate must survive cfg.fp_lookahead further greedy extension
    steps through B; a false-positive chain survives a step with
    P ~ 4*fp_rate, so depth d kills fakes with P ~ (4*fp)^d while the
    real path always continues (unless the path genuinely ends within d
    — then no candidate survives and the dist/cap trim applies, same as
    a dead end). Walks resume with the surviving base forced.

    Lane compaction (round 5): the resolver runs on a gathered frame of
    at most RESOLVE_CAP ambiguous lanes instead of the whole frontier —
    on backends where masked probes still compute (CPU; the fallback
    gather path), resolving over the full grid was ~35% of a 2 Mbp
    graph build. Each AMBIG retirement is processed EXACTLY ONCE
    (deterministic, so the former every-round reprocessing was pure
    rework): processed-but-unresolved lanes become END_DEAD (downstream
    treats DEAD and AMBIG identically — graph/build._pass1_contig), and
    still-unprocessed lanes stay END_AMBIG, which walk_waves and the
    wave driver treat as pending work."""
    k = cfg.size_kmer
    if solid_fn is None:
        solid_fn = lambda chi, clo, m: BL.cascade_solid(cascade, chi,
                                                        clo, m, cfg)
    amb_all = (fr.end_kind == END_AMBIG) & ~fr.active
    W_ = fr.forced.shape[0]
    CAP = _resolve_cap(W_)
    _, lanes = jax.lax.top_k(amb_all.astype(I32), CAP)
    amb = amb_all[lanes]
    fhi, flo = fr.fhi[lanes], fr.flo[lanes]
    rhi, rlo = fr.rhi[lanes], fr.rlo[lanes]
    # candidate frame [4, CAP]: the 4 right extensions in lockstep
    exts = [KM.right_ext(fhi, flo, rhi, rlo, np.uint32(b), k)
            for b in range(4)]
    cand = tuple(jnp.stack([e[j] for e in exts]) for j in range(4))
    chi, clo, _ = KM.canon_of(*cand)
    first = solid_fn(chi, clo, jnp.broadcast_to(amb, chi.shape))

    # Each lookahead step advances every candidate's BEAM of up to
    # BEAM solid paths by one base. Survival = "some solid path of
    # depth `look` exists from this candidate", so a path that veers
    # onto a dead-end error/fp spur dies in its beam slot WITHOUT
    # killing the candidate. (Round 4's single greedy path per
    # candidate — even with 2-level grandchild scoring — veer-killed
    # the REAL candidate whenever a nested error branch inside the
    # lookahead window tied on score and dead-ended: 2 Mbp walks
    # retired mid-unitig at step ~450 of a 29.7 kb path, the
    # 'no-node-gap' / stub break classes of bench/diagnose_breaks.)
    # Error chains are solid for up to k steps, so no finite scoring
    # depth fixes the greedy version; existence-over-a-beam does.
    look = int(cfg.fp_lookahead)
    BEAM = 4

    # beam state: code tuples [4, BEAM, W]; slot 0 = the candidate,
    # other slots start dead
    cur = tuple(jnp.repeat(c[:, None], BEAM, axis=1) for c in cand)
    alive = jnp.concatenate(
        [first[:, None],
         jnp.zeros((4, BEAM - 1) + first.shape[1:], bool)], axis=1)

    # one lookahead step as a fori_loop body (shape-invariant carry):
    # Python-unrolling `look` steps tripled trace size once depth grew
    # and made the routed-walk jit compile minutes-slow (round 4)
    def la_step(_, carry):
        cur, alive = carry
        # children of every beam slot: [4cand, 4child*BEAM, W]
        ch = [KM.right_ext(*cur, np.uint32(b2), k) for b2 in range(4)]
        opt = tuple(jnp.concatenate([e[j] for e in ch], axis=1)
                    for j in range(4))
        chi, clo, _ = KM.canon_of(*opt)
        m = jnp.concatenate([alive] * 4, axis=1)
        s_opt = solid_fn(chi, clo, m)              # [4, 4*BEAM, W]
        # keep the BEAM best options per candidate (solid first; stable
        # order breaks ties by option index). top_k over the option
        # axis; gather the codes of the winners.
        score = s_opt.astype(I32)
        _, top = jax.lax.top_k(jnp.moveaxis(score, 1, -1), BEAM)
        top = jnp.moveaxis(top, -1, 1)             # [4, BEAM, W]
        sel = lambda a: jnp.take_along_axis(a, top, axis=1)
        return tuple(sel(o) for o in opt), sel(s_opt)

    cur, alive = jax.lax.fori_loop(0, look, la_step, (cur, alive))
    strong4 = (first & jnp.any(alive, axis=1)).T   # [CAP, 4]
    scnt = jnp.sum(strong4, axis=-1)
    resolved = amb & (scnt == 1)
    if not cfg.break_on_deep_tie:
        # >=2 candidates surviving a DEEP lookahead means both paths are
        # real — almost always the two arms of an error bubble whose
        # junction a B-fp shadowed out of the node cascade (they rejoin,
        # so either choice reaches the same next junction; the unwalked
        # arm shows up as an equal-length parallel contig that
        # pop_bubbles removes). Breaking here fragments the assembly at
        # every shadowed bubble; continuing risks an over-merged walk
        # only at a shadow-missed TRUE fork (~fp_b of true junctions) —
        # those merged walks are repaired post-hoc by
        # clean.resolve_port_clashes, which was designed for exactly
        # this continue semantics. Round 4's convergence-gated retire
        # here regressed 2 Mbp truth_recovered 0.945 -> 0.801 (judge
        # bisect, VERDICT r4) because a retired walk is a dangling
        # break, not a node boundary; see tests/golden/
        # test_repeat_regression.py for the planted-repeat net.
        resolved = resolved | (amb & (scnt >= 2))
    return _scatter_resolved(fr, lanes, amb, resolved,
                             jnp.argmax(strong4, axis=-1).astype(I32))


def walk_waves(cascade: BL.Cascade, junctions: T.Table, fr, n_rounds: int,
               n_steps: int, cfg, walk_fn=None, resolve_fn=None,
               any_fn=None):
    """Run up to n_rounds walk rounds (each n_steps, with fp-branch
    resolution between rounds) in ONE device call under lax.while_loop,
    exiting early when the frontier drains.

    VERDICT r2 #3: the previous driver re-entered jit and synced a host
    scalar per 256-step round, which dominated graph-build wall-clock at
    Mbp scale (~600 small dispatches); this folds n_rounds of them into
    one dispatch + one convergence fetch. Device memory stays bounded at
    [W, n_rounds*n_steps] u8 per call (ADVICE r2 #3: strips drain to
    host once per call instead of accumulating across the whole walk).

    Returns (frontier, bases u8[W, n_rounds*n_steps], rounds_executed);
    bases is 255 where no advance happened — rounds never entered stay
    255 and are filtered by the host decoder.
    """
    walk_fn = walk_fn or walk_round
    resolve_fn = resolve_fn or resolve_ambiguous
    # continue-condition reducer: MUST be globally agreed when the
    # frontier is lane-sharded (dist/swalk.py passes a pmax over the
    # mesh axis), or shards exit the loop at different round counts and
    # the collectives inside deadlock
    any_fn = any_fn or jnp.any
    # derive the strip buffer from the (possibly shard-varying) frontier
    # rather than a fresh constant: under shard_map the loop writes
    # varying data into it and the carry types must match (vma checks)
    bases0 = jnp.tile(
        ((fr.steps * 0).astype(jnp.uint8) + jnp.uint8(255))[:, None],
        (1, n_rounds * n_steps))

    def cond(carry):
        r, fr, _, go = carry
        return (r < n_rounds) & go

    def pending(fr):
        # active lanes OR ambiguous retirees the capped resolver has
        # not judged yet (resolve_ambiguous processes <= RESOLVE_CAP
        # per round; unprocessed lanes keep END_AMBIG)
        return fr.active | (fr.end_kind == END_AMBIG)

    def body(carry):
        r, fr, bases, _ = carry
        fr, b = walk_fn(cascade, junctions, fr, n_steps=n_steps, cfg=cfg)
        fr = resolve_fn(cascade, fr, cfg)
        bases = jax.lax.dynamic_update_slice(bases, b, (0, r * n_steps))
        return (r + 1, fr, bases, any_fn(pending(fr)))

    r, fr, bases, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), fr, bases0, any_fn(pending(fr))))
    return fr, bases, r


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
    """Wide-code twin of resolve_ambiguous (same beam lookahead and
    lane compaction)."""
    from faucet_tpu.core import wide as WD

    k = cfg.size_kmer
    amb_all = (fr.end_kind == END_AMBIG) & ~fr.active
    W_ = fr.forced.shape[0]
    CAP = _resolve_cap(W_)
    _, lanes = jax.lax.top_k(amb_all.astype(I32), CAP)
    amb = amb_all[lanes]
    cfwd = tuple(w[lanes] for w in fr.fwd)
    crc = tuple(w[lanes] for w in fr.rc)
    # candidate frame: word tuples stacked to [4, CAP]
    exts = [WD.right_ext_wide(cfwd, crc, np.uint32(b), k)
            for b in range(4)]
    fwd = tuple(jnp.stack([e[0][j] for e in exts]) for j in range(4))
    rc = tuple(jnp.stack([e[1][j] for e in exts]) for j in range(4))
    c, _ = WD.canon_of_wide(fwd, rc)
    khi, klo = WD.fingerprint(c)
    first = BL.cascade_solid(cascade, khi, klo,
                             jnp.broadcast_to(amb, khi.shape), cfg)

    # beam-of-4 survival lookahead, same rationale as the narrow
    # resolver: a dead-end spur dies in its beam slot without killing
    # the candidate (see resolve_ambiguous).
    look = int(cfg.fp_lookahead)
    BEAM = 4

    fwd = tuple(jnp.repeat(w[:, None], BEAM, axis=1) for w in fwd)
    rc = tuple(jnp.repeat(w[:, None], BEAM, axis=1) for w in rc)
    alive = jnp.concatenate(
        [first[:, None],
         jnp.zeros((4, BEAM - 1) + first.shape[1:], bool)], axis=1)

    def la_step(_, carry):
        fwd, rc, alive = carry
        ch = [WD.right_ext_wide(fwd, rc, np.uint32(b2), k)
              for b2 in range(4)]
        ofwd = tuple(jnp.concatenate([e[0][j] for e in ch], axis=1)
                     for j in range(4))
        orc = tuple(jnp.concatenate([e[1][j] for e in ch], axis=1)
                    for j in range(4))
        cn, _ = WD.canon_of_wide(ofwd, orc)
        chi, clo = WD.fingerprint(cn)              # [4, 4*BEAM, W]
        m = jnp.concatenate([alive] * 4, axis=1)
        s_opt = BL.cascade_solid(cascade, chi, clo, m, cfg)
        score = s_opt.astype(I32)
        _, top = jax.lax.top_k(jnp.moveaxis(score, 1, -1), BEAM)
        top = jnp.moveaxis(top, -1, 1)             # [4, BEAM, W]
        sel = lambda a: jnp.take_along_axis(a, top, axis=1)
        return (tuple(sel(w) for w in ofwd),
                tuple(sel(w) for w in orc), sel(s_opt))

    fwd, rc, alive = jax.lax.fori_loop(0, look, la_step,
                                       (fwd, rc, alive))
    strong4 = (first & jnp.any(alive, axis=1)).T
    scnt = jnp.sum(strong4, axis=-1)
    resolved = amb & (scnt == 1)
    if not cfg.break_on_deep_tie:
        resolved = resolved | (amb & (scnt >= 2))  # see narrow twin
    return _scatter_resolved(fr, lanes, amb, resolved,
                             jnp.argmax(strong4, axis=-1).astype(I32))
