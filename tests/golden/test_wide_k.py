"""Wide-k (k > 31) differential tests vs the golden refimpl
(SURVEY.md §7.3 M3: 128-bit k-mers; config 2 needs k=55)."""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core import wide as WD
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.graph.build import extract_table
from faucet_tpu.pipeline import Pipeline
from refimpl.numpy_exact import ExactAssembler


def contig_keys(graph):
    return sorted(graph.contigs[i].canonical_seq() for i in graph.live())


@pytest.mark.parametrize("k", [41, 55])
def test_wide_codes_roundtrip(rng, k):
    seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(40)]
    bases, lens = __import__("faucet_tpu.core.kmer",
                             fromlist=["pack_reads"]).pack_reads(seqs, k)
    wv = WD.kmerize_wide(jnp.asarray(bases), jnp.asarray(lens), k)
    assert bool(wv.valid[:, 0].all())
    for i, s in enumerate(seqs):
        words = [int(np.asarray(w)[i, 0]) for w in wv.fwd]
        assert WD.decode_kmer_wide(words, k) == s
        rwords = [int(np.asarray(w)[i, 0]) for w in wv.rc]
        assert WD.decode_kmer_wide(rwords, k) == revcomp_seq(s)
        cwords = [int(np.asarray(w)[i, 0]) for w in wv.canon]
        assert WD.decode_kmer_wide(cwords, k) == min(s, revcomp_seq(s))


@pytest.mark.parametrize("k", [55])
def test_wide_pipeline_matches_refimpl(k):
    rng = np.random.default_rng(808)
    genome = simulate.genome_with_repeats(rng, 2500, n_repeats=2,
                                          repeat_len=220)
    reads = simulate.shred(rng, genome, coverage=40, read_len=120,
                           circular=True)
    asm = ExactAssembler(k)
    g_ref = asm.assemble(reads)

    cfg = Config(size_kmer=k, max_read_length=120, batch_reads=64,
                 exact=True, estimated_kmers=1 << 14, singletons=1 << 14,
                 junction_capacity=1 << 12, sink_capacity=1 << 14)
    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)

    # junction sets and cov/dist must match the golden model
    jt = extract_table(p.junctions)
    dev = {}
    for i in range(len(jt["hi"])):
        node = WD.decode_kmer_wide(jt["v2"][i], k)
        dev[node] = (jt["v0"][i].tolist(), jt["v1"][i].astype(int).tolist())
    ref = {n: (j["cov"], j["dist"]) for n, j in asm.junctions.items()}
    assert set(dev) == set(ref)
    for n in ref:
        assert dev[n] == ref[n], f"cov/dist mismatch at {n}"

    g_dev = p.build()
    assert contig_keys(g_dev) == contig_keys(g_ref)
