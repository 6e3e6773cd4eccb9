"""graph/clean._classify (the one-snapshot delete-rule classification
used by _delete_round AND the partitioned halo cleaner) must match an
independently-written reference classifier on random graphs — same kill
sets, same counters — including the effective-attachment (ghost-node)
rule, the tip cov guard, and the per-anchor keep-strongest rule."""
import numpy as np
import pytest

from faucet_tpu.graph import clean as CL
from faucet_tpu.graph.model import Contig, ContigGraph, End


def _random_graph(rng, n_contigs=120, n_nodes=30, k=21):
    g = ContigGraph(k)
    free = {f"n{j}": list(range(8)) for j in range(n_nodes)}

    def take_port(node):
        s = free[node].pop(rng.integers(0, len(free[node])))
        return s

    names = list(free)
    for _ in range(n_contigs):
        kind = rng.integers(0, 10)
        seq = "".join(rng.choice(list("ACGT"),
                                 size=int(rng.integers(k, 6 * k))))
        cov = float(rng.uniform(0.5, 6.0))
        left = right = None
        circular = False
        if kind == 0:
            circular = True
        else:
            cands = [nm for nm in names if free[nm]]
            if kind <= 4 and cands:          # one attached end (tip-like)
                nm = cands[rng.integers(0, len(cands))]
                e = End(nm, take_port(nm))
                if rng.integers(0, 2):
                    left = e
                else:
                    right = e
            elif kind <= 8 and len(cands) >= 2:   # both ends attached
                nm1 = cands[rng.integers(0, len(cands))]
                left = End(nm1, take_port(nm1))
                cands = [nm for nm in names if free[nm]]
                nm2 = cands[rng.integers(0, len(cands))]
                right = End(nm2, take_port(nm2))
            # else: isolated (no ends)
        g.add_contig(Contig(seq=seq, cov=cov, left=left, right=right,
                            circular=circular))
    return g


def _classify_ref(g, max_tip_len, min_cov, do_tips=True, do_low_cov=True,
                  chim_ratio=0.0):
    """Independent straight-line re-statement of the _classify spec.

    Attachment / anchor strength / claim counts come from contig End
    records (the claim map), NOT the port registry — the registry is
    last-writer-wins per (node, slot) and loses clash-hidden claimants.
    """
    k = g.k
    claims = {}
    for i in g.live():
        c = g.contigs[i]
        for e in (c.left, c.right):
            if e is not None:
                claims.setdefault(e.node, []).append(i)
    tips_by_anchor, lowcov, chim, iso = {}, [], [], []
    for i in g.live():
        c = g.contigs[i]
        if c.circular:
            continue
        eff = []
        for e in (c.left, c.right):
            if e is None:
                eff.append(None)
                continue
            others = [ci for ci in claims.get(e.node, []) if ci != i]
            eff.append(e if others else None)
        n_eff = sum(x is not None for x in eff)
        if n_eff == 0:
            if do_low_cov and len(c.seq) < 3 * k \
                    and c.cov <= CL.ISO_COV_MULT * min_cov:
                iso.append(i)
        elif n_eff == 1:
            if not do_tips or len(c.seq) >= max_tip_len:
                continue
            e = eff[0] or eff[1]
            if len(c.seq) >= 2 * k:
                mo = max(g.contigs[ci].cov for ci in claims[e.node]
                         if ci != i)
                if c.cov >= CL.TIP_KEEP_RATIO * mo:
                    continue
            tips_by_anchor.setdefault(e.node, []).append(
                (i, c.cov, CL.seq_rank64(c.canonical_seq()), e.slot))
        elif do_low_cov and c.cov < min_cov:
            lowcov.append(i)
        elif do_low_cov and chim_ratio > 0 \
                and len(c.seq) < max_tip_len:
            strengths = [max(g.contigs[ci].cov
                             for ci in claims[e.node] if ci != i)
                         if any(ci != i for ci in claims[e.node]) else 0.0
                         for e in eff]
            if c.cov <= chim_ratio * min(strengths):
                chim.append(i)
    tips = []
    for node, js in tips_by_anchor.items():
        if len(claims[node]) - len(js) >= 1:
            tips += [t[0] for t in js]
        else:
            keep = max(js, key=lambda t: (t[1], t[2], t[3]))[0]
            tips += [t[0] for t in js if t[0] != keep]
    return sorted(tips), sorted(lowcov), sorted(chim), sorted(iso)


def _clone(g):
    import copy

    return copy.deepcopy(g)


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 11])
def test_classify_matches_reference(seed):
    rng = np.random.default_rng(seed)
    g = _random_graph(rng)
    tip_len, min_cov = 80, 2.5
    for _ in range(6):
        ref = _classify_ref(g, tip_len, min_cov, chim_ratio=0.25)
        got = CL._classify(g, tip_len, min_cov, True, True,
                           chim_ratio=0.25)
        assert (got[0], sorted(got[1]), sorted(got[2]),
                sorted(got[3])) == ref
        t, l, ch, i = CL._delete_round(g, tip_len, min_cov, True, True,
                                       chim_ratio=0.25)
        assert (t, l, ch, i) == tuple(len(x) for x in ref)
        if not (t + l + ch + i):
            break


def test_delete_round_tip_anchor_rule():
    """Two tips alone on one node: exactly one (strongest) survives."""
    g = ContigGraph(21)
    g.add_contig(Contig(seq="A" * 30, cov=5.0, left=End("x", 0)))
    g.add_contig(Contig(seq="A" * 30, cov=5.0, right=End("x", 4)))
    t, _, _, _ = CL._delete_round(g, 100, 0.0, True, True)
    assert t == 1
    # equal cov + equal canonical seq: the higher slot survives
    assert g.contigs[0].deleted and not g.contigs[1].deleted


def test_ghost_node_arm_is_a_tip():
    """The round-3 Mbp failure mode: a short error arm whose far end sits
    on a degree-1 ghost node reads as both-ends-attached to the old rules
    (so neither tips nor low-cov nor bubbles fired); the effective-
    attachment rule must classify it as a tip and clip it."""
    k = 21
    g = ContigGraph(k)
    # real through path: long-left --(X)-- long-right
    g.add_contig(Contig(seq="A" * 500, cov=18.0, right=End("X", 5)))
    g.add_contig(Contig(seq="C" * 500, cov=19.0, left=End("X", 1)))
    # error arm: X --(45bp, cov 3)-- ghost node G (no other ports)
    g.add_contig(Contig(seq="G" * 45, cov=3.0, left=End("X", 2),
                        right=End("G", 0)))
    t, _, _, _ = CL._delete_round(g, 200, 2.5, True, True)
    assert t == 1 and g.contigs[2].deleted
    # after the clip, X is 1-in/1-out (collapse-eligible; actual merge
    # needs real orientation-invariant sequences, tested in golden/)
    assert g.node_degree("X") == (1, 1)


def test_high_cov_long_tip_survives():
    """A >=2k stub at ~the through coverage (a genome-terminal segment
    cut off by a spurious junction) must NOT be clipped; a same-shape
    low-cov stub must be."""
    k = 21
    g = ContigGraph(k)
    g.add_contig(Contig(seq="A" * 500, cov=18.0, right=End("X", 5)))
    g.add_contig(Contig(seq="C" * 139, cov=18.0, left=End("X", 1)))
    t, _, _, _ = CL._delete_round(g, 200, 2.5, True, True)
    assert t == 0 and not g.contigs[1].deleted

    g2 = ContigGraph(k)
    g2.add_contig(Contig(seq="A" * 500, cov=18.0, right=End("X", 5)))
    g2.add_contig(Contig(seq="C" * 139, cov=3.0, left=End("X", 1)))
    t, _, _, _ = CL._delete_round(g2, 200, 2.5, True, True)
    assert t == 1 and g2.contigs[1].deleted


def test_isolated_anchor_count_normalization():
    """Isolated-contig cov is an end-anchor count (~2 per read): a
    doubled-error k-mer island lands at cov ~4 and must die at
    min_cov=2.5; a genuine small component at real depth survives."""
    k = 31
    g = ContigGraph(k)
    g.add_contig(Contig(seq="A" * 31, cov=4.0))          # error island
    g.add_contig(Contig(seq="C" * 31, cov=40.0))         # real plasmid-let
    g.add_contig(Contig(seq="G" * 400, cov=1.0))         # long: kept
    _, _, _, iso = CL._delete_round(g, 200, 2.5, True, True)
    assert iso == 1
    assert g.contigs[0].deleted
    assert not g.contigs[1].deleted and not g.contigs[2].deleted
