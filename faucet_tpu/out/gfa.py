"""GFA 1.0 emission of the assembly graph.

Reference analogue: printGFA (ref:src/ContigGraph.cpp [C:med]). Segments
are contigs; links connect contigs adjacent through a junction node. Links
carry a k-base overlap because every incident contig includes the node's
full k-mer (documented divergence from (k-1)-overlap unitig GFA; see
graph/model.py docstring).
"""
from __future__ import annotations

from faucet_tpu.graph.model import ContigGraph


def write_gfa(g: ContigGraph, path: str):
    live = g.live()
    name = {idx: f"contig_{n}" for n, idx in enumerate(live)}
    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for idx in live:
            c = g.contigs[idx]
            f.write(f"S\t{name[idx]}\t{c.seq}\tdp:f:{c.cov:.2f}\n")
        seen = set()
        for ia, sa, ib, sb in g.links():
            rec = (ia, sa, ib, sb)
            # a link and its reverse-complement reading are the same edge
            rev = (ib, "+" if sb == "-" else "-", ia, "+" if sa == "-" else "-")
            if rec in seen or rev in seen:
                continue
            seen.add(rec)
            f.write(f"L\t{name[ia]}\t{sa}\t{name[ib]}\t{sb}\t{g.k}M\n")
