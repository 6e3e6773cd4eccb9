"""junction_detect="nodes" vs "ext8": identical pipelines in exact mode.

The branch-node cascade (core/nodes.py) and the 8-way extension probe
must discover the same junction table and emit the same contigs over
exact membership (tests/unit/test_nodes.py proves the per-window
predicate equal away from palindromic (k-1)-nodes; this covers the full
load/scan/build/clean path end to end). Bloom mode is additionally
checked for genome-true contigs after cleaning.
"""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.graph.build import extract_table
from faucet_tpu.pipeline import Pipeline

K = 21


def _cfg(mode, exact=True):
    return Config(size_kmer=K, max_read_length=100, batch_reads=64,
                  exact=exact, estimated_kmers=1 << 14,
                  singletons=1 << 14, junction_capacity=1 << 13,
                  sink_capacity=1 << 13, fp_rate=0.002,
                  junction_detect=mode)


def _run(mode, reads, exact=True):
    p = Pipeline(_cfg(mode, exact))
    p.load_reads(reads)
    p.scan_reads(reads)
    g = p.build()
    g = p.clean_graph(g)
    return p, g


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(4242)
    genome = simulate.genome_with_repeats(rng, 3000, n_repeats=2,
                                          repeat_len=200)
    reads = simulate.shred(rng, genome, coverage=40, read_len=100,
                           circular=True)
    return genome, reads


def test_exact_nodes_equals_ext8(case):
    genome, reads = case
    p_n, g_n = _run("nodes", reads)
    p_e, g_e = _run("ext8", reads)

    jt_n = extract_table(p_n.junctions)
    jt_e = extract_table(p_e.junctions)
    keys_n = sorted(zip(jt_n["hi"].tolist(), jt_n["lo"].tolist()))
    keys_e = sorted(zip(jt_e["hi"].tolist(), jt_e["lo"].tolist()))
    assert keys_n == keys_e

    contigs_n = sorted(g_n.contigs[i].canonical_seq() for i in g_n.live())
    contigs_e = sorted(g_e.contigs[i].canonical_seq() for i in g_e.live())
    assert contigs_n == contigs_e


def test_bloom_nodes_genome_true():
    # repeat-free genome: long unresolvable repeats without pair evidence
    # can misjoin in EITHER junction mode (reference resolves them only
    # with --paired_ends), so genome-truth is asserted repeat-free
    rng = np.random.default_rng(909)
    genome = simulate.random_genome(rng, 4000)
    reads = simulate.shred(rng, genome, coverage=40, read_len=100,
                           circular=True)
    _, g = _run("nodes", reads, exact=False)
    from faucet_tpu.core.kmer import revcomp_seq

    doubled = genome + genome  # circular genome: any rotation is true
    both = doubled + "#" + revcomp_seq(doubled)
    total = 0
    for i in g.live():
        c = g.contigs[i]
        s = c.seq if not c.circular else c.seq + c.seq[: K - 1]
        assert s in both, f"contig not genome-true: {s[:50]}..."
        total += len(c.seq)
    assert total >= 0.9 * len(genome)


def test_bloom_junction_free_not_fragmented():
    """A junction-free linear genome must assemble into ~one contig in
    Bloom mode: walks that hit Bloom-fp branches re-arm via lookahead
    (graph/walk.py resolve_ambiguous) instead of fragmenting — the
    regression that produced 66 fragments from a 20 kb genome before."""
    rng = np.random.default_rng(321)
    genome = simulate.random_genome(rng, 20000)
    reads = []
    L = 100
    for _ in range(20000 * 30 // L // 2):
        s = rng.integers(0, len(genome) - L)
        r = genome[s:s + L]
        reads += [r, r]  # duplicates -> every covered k-mer is solid
    cfg = Config(size_kmer=21, max_read_length=100, batch_reads=256,
                 exact=False, estimated_kmers=1 << 15, singletons=1 << 15,
                 junction_capacity=1 << 13, sink_capacity=1 << 15,
                 fp_rate=0.01, junction_detect="nodes")
    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)
    g = p.build()
    g = p.clean_graph(g)
    lens = sorted((len(g.contigs[i].seq) for i in g.live()), reverse=True)
    assert lens[0] >= 0.95 * len(genome), lens[:5]
    assert len(lens) <= 3, lens
