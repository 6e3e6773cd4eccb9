"""M0 golden tests: the exact assembler reconstructs synthetic genomes
(SURVEY.md §4: golden/differential strategy; §7.3 M0)."""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.graph.clean import clean
from refimpl.numpy_exact import ExactAssembler, canon
from refimpl.unitigs import genome_graph

K = 21


def contig_keys(graph):
    return sorted(graph.contigs[i].canonical_seq() for i in graph.live())


def assert_contigs_in_genome(graph, genome, circular=False):
    src = genome + (genome[: len(genome) // 1] if circular else "")
    both = src + "#" + revcomp_seq(src)
    for i in graph.live():
        c = graph.contigs[i]
        assert c.seq in both, f"contig not a genome substring: {c.seq[:50]}..."


def test_circular_no_repeats_single_contig(rng):
    genome = simulate.random_genome(rng, 3000)
    reads = simulate.shred(rng, genome, coverage=40, read_len=100,
                           circular=True)
    asm = ExactAssembler(K)
    g = asm.assemble(reads)
    clean(g, do_tips=False, do_low_cov=False)  # collapse only
    live = g.live()
    assert len(live) == 1
    c = g.contigs[live[0]]
    assert c.circular
    assert len(c.seq) == len(genome)
    # same cycle up to rotation/orientation
    truth = genome_graph(genome, K, circular=True)
    assert contig_keys(g) == contig_keys(truth)


def test_repeat_genome_matches_truth_unitigs(rng):
    genome = simulate.genome_with_repeats(rng, 6000, n_repeats=2,
                                          repeat_len=400)
    reads = simulate.shred(rng, genome, coverage=50, read_len=100,
                           circular=True)
    asm = ExactAssembler(K)
    g = asm.assemble(reads)
    assert len(asm.junctions) > 0, "planted repeat must create junctions"
    clean(g, do_tips=False, do_low_cov=False)
    truth = genome_graph(genome, K, circular=True)
    clean(truth, do_tips=False, do_low_cov=False)
    assert contig_keys(g) == contig_keys(truth)
    # contigs may span the circular wrap anywhere: check against doubled genome
    assert_contigs_in_genome(g, genome + genome, circular=False)


def test_linear_genome_recovers_interior(rng):
    genome = simulate.random_genome(rng, 4000)
    reads = simulate.shred(rng, genome, coverage=50, read_len=100)
    asm = ExactAssembler(K)
    g = asm.assemble(reads)
    clean(g, do_tips=False, do_low_cov=False)
    live = g.live()
    assert len(live) == 1
    c = g.contigs[live[0]]
    assert not c.circular
    # ends may be undersampled (seen<2) but interior must be exact
    assert len(c.seq) >= len(genome) - 60
    assert c.seq in genome or revcomp_seq(c.seq) in genome


def test_errors_are_cleaned_away(rng):
    genome = simulate.random_genome(rng, 3000)
    reads = simulate.shred(rng, genome, coverage=50, read_len=100,
                           circular=True, err_rate=0.005)
    asm = ExactAssembler(K)
    g = asm.assemble(reads)
    clean(g, max_tip_len=200, min_cov=3.0)
    # every surviving contig must be genuine genome sequence
    doubled = genome + genome
    both = doubled + "#" + revcomp_seq(doubled)
    live = g.live()
    total = 0
    for i in live:
        c = g.contigs[i]
        s = c.seq if not c.circular else c.seq + c.seq[: K - 1]
        assert s in both, "error-derived contig survived cleaning"
        total += len(c.seq)
    assert total >= len(genome) - 100  # near-full reconstruction


def test_sink_only_component_and_short_reads(rng):
    # two small disconnected plasmids, no repeats, no junctions
    g1 = simulate.random_genome(rng, 800)
    g2 = simulate.random_genome(rng, 600)
    reads = (simulate.shred(rng, g1, 40, 80, circular=True)
             + simulate.shred(rng, g2, 40, 80, circular=True)
             + ["ACGT", ""])  # degenerate reads must be ignored
    asm = ExactAssembler(K)
    g = asm.assemble(reads)
    clean(g, do_tips=False, do_low_cov=False)
    assert len(g.live()) == 2
    assert all(g.contigs[i].circular for i in g.live())
    assert sorted(len(g.contigs[i].seq) for i in g.live()) == [600, 800]


def test_paired_capture_smoke(rng):
    genome = simulate.genome_with_repeats(rng, 4000, n_repeats=2,
                                          repeat_len=300)
    m1, m2 = simulate.shred(rng, genome, coverage=30, read_len=100,
                            circular=True, paired=True, insert=400)
    asm = ExactAssembler(K, paired_ends=True)
    asm.load(m1 + m2)
    asm.scan_pairs(m1, m2)
    assert len(asm.junctions) > 0
    assert len(asm.pairs) > 0
