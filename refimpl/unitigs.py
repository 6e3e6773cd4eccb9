"""Ground-truth unitig decomposition built directly from a genome.

Feeds the golden tests: the streamed assembly of error-free, fully
covering reads must reconstruct exactly the unitig graph of the genome
itself (SURVEY.md §4 "golden/differential"). Reuses the walk conventions
of the exact assembler but takes its k-mer set straight from the genome,
bypassing reads entirely — so the two inputs are independent.
"""
from __future__ import annotations

from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.graph.model import ContigGraph
from refimpl.numpy_exact import BASES, ExactAssembler, canon


def genome_graph(genome: str, k: int, circular: bool = False) -> ContigGraph:
    asm = ExactAssembler(k)
    src = genome + genome[: k - 1] if circular else genome
    kms = {canon(src[i : i + k]) for i in range(len(src) - k + 1)}
    asm.seen = set(kms)
    asm.solid = set(kms)
    for c in kms:
        if not asm.is_branch(c):
            continue
        j = asm.junctions.setdefault(c, {"cov": [0] * 8, "dist": [0] * 8})
        for b in range(4):
            if asm.is_solid(canon(c[1:] + BASES[b])):
                j["cov"][b] = 1
            if asm.is_solid(canon(BASES[b] + c[:-1])):
                j["cov"][4 + b] = 1
    # seeds for junction-free components (whole-genome cycles / lines)
    asm.sinks[canon(src[:k])] = 1
    if not circular:
        asm.sinks[canon(src[-k:])] = 1
    return asm.build()
