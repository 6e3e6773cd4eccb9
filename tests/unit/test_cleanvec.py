"""Vectorized delete round (graph/clean._delete_round) must reproduce
the sequential passes exactly — same deleted set, same counters —
including the per-anchor keep-the-last-tip rule (VERDICT r1 #8)."""
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
        seq = "A" * int(rng.integers(k, 6 * k))
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


def _clone(g):
    import copy

    return copy.deepcopy(g)


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 11])
def test_delete_round_matches_sequential(seed):
    rng = np.random.default_rng(seed)
    g1 = _random_graph(rng)
    g2 = _clone(g1)
    tip_len, min_cov = 80, 2.5
    for _ in range(4):
        t1 = CL.clip_tips(g1, tip_len)
        l1 = CL.drop_low_cov(g1, min_cov)
        i1 = CL.drop_short_isolated(g1, min_cov)
        t2, l2, i2 = CL._delete_round(g2, tip_len, min_cov, True, True)
        assert (t1, l1, i1) == (t2, l2, i2)
        assert [c.deleted for c in g1.contigs] == \
            [c.deleted for c in g2.contigs]
        if not (t1 + l1 + i1):
            break


def test_delete_round_tip_anchor_rule():
    """Two tips alone on one node: exactly one (the later) survives."""
    g = ContigGraph(21)
    g.add_contig(Contig(seq="A" * 30, cov=5.0, left=End("x", 0)))
    g.add_contig(Contig(seq="A" * 30, cov=5.0, right=End("x", 4)))
    t, _, _ = CL._delete_round(g, 100, 0.0, True, True)
    assert t == 1
    assert g.contigs[0].deleted and not g.contigs[1].deleted
