"""Sharded paired-end capture + disentangle (VERDICT r1 #5): the 8-shard
pipeline's pair table must carry the same content as the single-device
one, and sharded disentangle must phase the planted repeat identically.
Mirrors tests/golden/test_pairs.py on the virtual CPU mesh.
"""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.dist.mesh import make_mesh
from faucet_tpu.dist.sharded import ShardedPipeline
from faucet_tpu.pipeline import Pipeline

K = 21
S = 8


@pytest.fixture(scope="module")
def phased_case():
    rng = np.random.default_rng(4242)
    g = lambda n: simulate.random_genome(rng, n)
    p, q, s, t, r = g(40), g(40), g(40), g(40), g(40)
    A, B, C, D = g(60), g(60), g(60), g(60)
    M = [g(220) for _ in range(6)]
    genome = (p + A + r + B + q + M[0] + s + C + r + D + t + M[1]
              + p + M[2] + q + M[3] + s + M[4] + t + M[5])
    m1, m2 = simulate.shred(rng, genome, coverage=60, read_len=80,
                            circular=True, paired=True, insert=250)
    truth = (A + r + B, C + r + D)
    wrong = (A + r + D, C + r + B)
    return genome, m1, m2, truth, wrong


def _check_phasing(graph, truths, wrongs):
    seqs = []
    for i in graph.live():
        c = graph.contigs[i]
        s = c.seq + (c.seq[: K - 1] if c.circular else "")
        seqs.append(s)
        seqs.append(revcomp_seq(s))
    joined = "#".join(seqs)
    return (sum(1 for x in truths if x in joined),
            sum(1 for x in wrongs if x in joined))


def test_sharded_pairs_match_single_device_and_phase(phased_case):
    genome, m1, m2, truths, wrongs = phased_case
    interleaved = [x for ab in zip(m1, m2) for x in ab]
    mk = dict(size_kmer=K, max_read_length=80, batch_reads=128,
              exact=True, estimated_kmers=1 << 15, singletons=1 << 15,
              junction_capacity=1 << 13, sink_capacity=1 << 15,
              pair_capacity=1 << 14, paired_ends=True)

    sp = ShardedPipeline(Config(n_shards=S, **mk), make_mesh(S))
    sp.load_reads(interleaved)
    sp.scan_paired(interleaved)
    assert sp.metrics.counters.get("route_dropped", 0) == 0

    p = Pipeline(Config(**mk))
    p.load_reads(interleaved)
    p.scan_paired(interleaved)

    assert sp.pair_counts() == p.pair_counts()
    assert len(sp.pair_counts()) > 0

    g = sp.build()
    g = sp.clean_graph(g)
    hit_t, hit_w = _check_phasing(g, truths, wrongs)
    assert hit_t == 2 and hit_w == 0
