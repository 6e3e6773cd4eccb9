"""Differential tests: device pipeline vs the M0 golden refimpl
(SURVEY.md §4, §7.1.6 — exact mode must match the golden model exactly;
Bloom mode must be genome-true after cleaning)."""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core.kmer import decode_kmer, revcomp_seq
from faucet_tpu.graph.build import extract_table
from faucet_tpu.graph.clean import clean
from faucet_tpu.pipeline import Pipeline
from refimpl.numpy_exact import ExactAssembler

K = 21


def _cfg(exact=True, **kw):
    base = dict(size_kmer=K, max_read_length=100, batch_reads=64,
                exact=exact, estimated_kmers=1 << 14, singletons=1 << 14,
                junction_capacity=1 << 13, sink_capacity=1 << 13,
                fp_rate=0.002)
    base.update(kw)
    return Config(**base)


def contig_keys(graph):
    return sorted(graph.contigs[i].canonical_seq() for i in graph.live())


@pytest.fixture(scope="module")
def repeat_case():
    rng = np.random.default_rng(777)
    genome = simulate.genome_with_repeats(rng, 3000, n_repeats=2,
                                          repeat_len=200)
    reads = simulate.shred(rng, genome, coverage=40, read_len=100,
                           circular=True)
    return genome, reads


def test_exact_pipeline_matches_refimpl(repeat_case):
    genome, reads = repeat_case
    asm = ExactAssembler(K)
    asm.load(reads)
    asm.scan(reads)

    p = Pipeline(_cfg(exact=True))
    p.load_reads(reads)
    p.scan_reads(reads)

    # --- junction tables must be identical ---
    jt = extract_table(p.junctions)
    dev = {}
    for i in range(len(jt["hi"])):
        node = decode_kmer(int(jt["hi"][i]), int(jt["lo"][i]), K)
        dev[node] = (jt["v0"][i].tolist(), jt["v1"][i].astype(int).tolist())
    ref = {n: (j["cov"], j["dist"]) for n, j in asm.junctions.items()}
    assert set(dev) == set(ref), (
        f"junction sets differ: only-dev={set(dev)-set(ref)}, "
        f"only-ref={set(ref)-set(dev)}")
    for n in ref:
        assert dev[n][0] == ref[n][0], f"cov mismatch at {n}"
        assert dev[n][1] == ref[n][1], f"dist mismatch at {n}"

    # --- sink tables must be identical ---
    st = extract_table(p.sinks)
    dev_s = {decode_kmer(int(st["hi"][i]), int(st["lo"][i]), K):
             int(st["v0"][i]) for i in range(len(st["hi"]))}
    assert dev_s == asm.sinks

    # --- contigs must be identical ---
    g_ref = asm.build()
    g_dev = p.build()
    assert contig_keys(g_dev) == contig_keys(g_ref)
    ref_cov = {g_ref.contigs[i].canonical_seq(): g_ref.contigs[i].cov
               for i in g_ref.live()}
    for i in g_dev.live():
        c = g_dev.contigs[i]
        assert ref_cov[c.canonical_seq()] == pytest.approx(c.cov)


def test_bloom_pipeline_genome_true(repeat_case):
    genome, reads = repeat_case
    p = Pipeline(_cfg(exact=False))
    g = p.run_file_mode(reads, reads)
    doubled = genome + genome
    both = doubled + "#" + revcomp_seq(doubled)
    total = 0
    for i in g.live():
        c = g.contigs[i]
        s = c.seq if not c.circular else c.seq + c.seq[: K - 1]
        assert s in both, "Bloom-mode contig not genome-true after cleaning"
        total += len(c.seq)
    assert total >= len(genome) - 250  # repeats collapse one copy


def test_streaming_mode_close_to_two_pass(repeat_case):
    genome, reads = repeat_case
    p = Pipeline(_cfg(exact=True))
    g = p.run_streaming(reads)
    doubled = genome + genome
    both = doubled + "#" + revcomp_seq(doubled)
    for i in g.live():
        c = g.contigs[i]
        s = c.seq if not c.circular else c.seq + c.seq[: K - 1]
        assert s in both
