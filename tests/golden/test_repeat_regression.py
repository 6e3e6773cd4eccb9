"""Planted-repeat walk-semantics regression net (VERDICT r4 #2).

Round 4's final commit changed deep-tie arbitration in graph/walk.py
(convergence-gated retire) and regressed Mbp-scale truth-unitig recovery
0.945 -> 0.801 — undetected because every golden test ran at ~3 kb where
the repeat-boundary/deep-tie machinery never fires, and the only check
that fires it was an 8-minute scale run outside pytest.

This test is the fast net: a seeded few-hundred-kb genome with a planted
multi-copy ~450 bp repeat, 30x coverage, 0.5% substitution error, Bloom
(non-exact) mode — big enough that shadow-missed junctions and deep
walk ties occur, small enough to run in well under a minute on the CPU
mesh. Asserts full truth-unitig recovery, the flagship BASELINE metric
(truth unitigs from refimpl/unitigs.py genome_graph, the same oracle
bench/scale_run.py gates on).

Reference analogue: the contig-equivalence target of BASELINE.json
("contig N50 parity; contigs/GFA equivalent to reference") exercised at
the scale where ref:src/ContigGraph.cpp's repeat handling matters.
"""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.metrics import Metrics
from faucet_tpu.pipeline import Pipeline, batch_iter
from refimpl.unitigs import genome_graph

K = 31


@pytest.mark.slow
def test_planted_repeat_full_recovery():
    G = 300_000
    rng = np.random.default_rng(20260821)
    genome = simulate.genome_with_repeats(rng, G, n_repeats=4,
                                          repeat_len=450)
    reads = simulate.shred(rng, genome, coverage=30, read_len=100,
                           err_rate=0.005, circular=True)
    n_kmers = len(genome) - K + 1
    cfg = Config(size_kmer=K, max_read_length=100, batch_reads=1 << 15,
                 estimated_kmers=n_kmers,
                 singletons=int(len(reads) * 100 * 0.005 * K) + n_kmers,
                 junction_capacity=1 << 18, sink_capacity=4 * n_kmers,
                 fp_rate=0.01)
    p = Pipeline(cfg, Metrics())
    p.load_batches(batch_iter(reads, cfg))
    p.scan_batches(batch_iter(reads, cfg))
    g = p.build()
    g = p.clean_graph(g)
    contigs = [g.contigs[i].seq for i in g.live()]

    tg = genome_graph(genome, K, circular=True)
    truth = [tg.contigs[i].seq for i in tg.live()]

    # bench.py at repo root shadows the bench/ dir — load by path
    import importlib.util
    import os

    qpath = os.path.join(os.path.dirname(__file__), "..", "..",
                         "bench", "quality.py")
    spec = importlib.util.spec_from_file_location("_bench_quality", qpath)
    qual = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qual)

    rec = qual.truth_recovery(contigs, truth, genome)
    assert rec["truth_recovered_frac"] == 1.0, (
        f"truth unitigs broken: {rec['truth_unitigs_missed']}/"
        f"{len(truth)} missed, lens {rec['missed_lens']} "
        f"(walk/clean semantics regression — see graph/walk.py "
        f"resolve_ambiguous deep-tie rule)")
