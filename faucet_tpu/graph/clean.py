"""Graph cleaning passes over the host-side compacted graph.

Reference analogue: ContigGraph's cleaning pipeline — deleteTipsAndClean,
low-coverage/chimeric deletion, collapseDummyNodes, Bloom-FP pruning
(ref:src/ContigGraph.cpp, SURVEY.md §2.1 [C:high], §A.7). Passes iterate
to a fixpoint, then paired-end disentanglement runs once (§A.7e).

Note on FP pruning: in this design Bloom false positives can only create
(a) extra 1-in/1-out junction nodes — removed by collapse; (b) cov-0 slots
— never walked; (c) FP tails past dead ends — trimmed at walk time by the
recorded dist. So "FP pruning" is structural here rather than a separate
pass (SURVEY.md §7.1 divergence note).

The compacted graph is O(genome branch points) — host-scale. Distributed
cleaning for metagenome-scale graphs arrives with the sharded pipeline.
"""
from __future__ import annotations

from faucet_tpu.graph.model import ContigGraph


def clip_tips(g: ContigGraph, max_tip_len: int) -> int:
    """Delete short dead-end stubs hanging off junction nodes."""
    removed = 0
    for i in g.live():
        c = g.contigs[i]
        if c.circular:
            continue
        n_attached = (c.left is not None) + (c.right is not None)
        if n_attached != 1 or len(c.seq) >= max_tip_len:
            continue
        e = c.left if c.left is not None else c.right
        # only a tip if the anchor node keeps other structure
        r, l = g.node_degree(e.node)
        if r + l <= 1:
            continue
        g.remove_contig(i)
        removed += 1
    return removed


def drop_low_cov(g: ContigGraph, min_cov: float) -> int:
    """Delete low-coverage contigs that bridge junctions (chimeras)."""
    removed = 0
    for i in g.live():
        c = g.contigs[i]
        if c.circular or c.left is None or c.right is None:
            continue
        if c.cov < min_cov:
            g.remove_contig(i)
            removed += 1
    return removed


def drop_short_isolated(g: ContigGraph, min_cov: float) -> int:
    """Delete tiny isolated linear contigs (doubled-error islands): no
    junction on either end, shorter than 3k, below the cov threshold.
    Long isolated contigs (plasmids, junction-free components) are kept
    regardless of cov — pass-2 sink cov is an end-anchor count, not depth.
    """
    removed = 0
    for i in g.live():
        c = g.contigs[i]
        if c.circular or c.left is not None or c.right is not None:
            continue
        if len(c.seq) < 3 * g.k and c.cov < min_cov:
            g.remove_contig(i)
            removed += 1
    return removed


def collapse_all(g: ContigGraph) -> int:
    merged = 0
    for node in list(g.ports.keys()):
        if node in g.ports and g.collapse_node(node):
            merged += 1
    return merged


def clean(g: ContigGraph, max_tip_len: int = 200, min_cov: float = 2.0,
          do_tips: bool = True, do_low_cov: bool = True,
          max_rounds: int = 64) -> dict:
    """Iterate passes to fixpoint. Returns pass counters."""
    stats = {"tips": 0, "low_cov": 0, "isolated": 0, "collapsed": 0,
             "rounds": 0}
    for _ in range(max_rounds):
        changed = 0
        if do_tips:
            n = clip_tips(g, max_tip_len)
            stats["tips"] += n
            changed += n
        if do_low_cov:
            n = drop_low_cov(g, min_cov)
            stats["low_cov"] += n
            changed += n
            n = drop_short_isolated(g, min_cov)
            stats["isolated"] += n
            changed += n
        n = collapse_all(g)
        stats["collapsed"] += n
        changed += n
        stats["rounds"] += 1
        if not changed:
            break
    return stats
