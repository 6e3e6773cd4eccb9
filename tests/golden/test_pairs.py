"""Paired-end capture + disentangle tests (SURVEY.md §3.4, §A.7e).

The genome plants repeat r twice with flanks touching four DISTINCT outer
junction families (p, q, s, t, each also planted twice elsewhere), so
mate pairs spanning each r copy hit discriminative junction pairs
(pOut,qIn) / (sOut,tIn) — the minimal topology where junction-pair
evidence can phase a repeat.
"""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.graph.clean import clean
from faucet_tpu.pipeline import Pipeline
from refimpl.numpy_exact import ExactAssembler

K = 21


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
    truth_1 = A + r + B   # phase 1 splice through the repeat
    truth_2 = C + r + D
    wrong_1 = A + r + D
    wrong_2 = C + r + B
    return genome, m1, m2, (truth_1, truth_2), (wrong_1, wrong_2)


def _check_phasing(graph, truths, wrongs):
    seqs = []
    for i in graph.live():
        c = graph.contigs[i]
        s = c.seq + (c.seq[: K - 1] if c.circular else "")
        seqs.append(s)
        seqs.append(revcomp_seq(s))
    joined = "#".join(seqs)
    hit_t = sum(1 for x in truths if x in joined)
    hit_w = sum(1 for x in wrongs if x in joined)
    return hit_t, hit_w


def test_refimpl_disentangle_phases_repeat(phased_case):
    genome, m1, m2, truths, wrongs = phased_case
    asm = ExactAssembler(K, paired_ends=True)
    asm.load(m1 + m2)
    asm.scan_pairs(m1, m2)
    assert len(asm.pairs) > 0
    g = asm.build()

    # without pairs: repeat r stays a separate contig; the spliced
    # sequence must NOT exist yet
    import copy

    g0 = copy.deepcopy(g)
    clean(g0, max_tip_len=160, min_cov=2.5)
    t0, _ = _check_phasing(g0, truths, wrongs)
    assert t0 == 0, "repeat resolved without any pair evidence?"

    st = clean(g, max_tip_len=160, min_cov=2.5,
               pair_count=asm.pair_count, min_pairs=2)
    assert st["disentangled"] >= 1, f"no disentangle happened: {st}"
    hit_t, hit_w = _check_phasing(g, truths, wrongs)
    assert hit_t == 2, "both phased splices must exist"
    assert hit_w == 0, "cross-phased splice must not exist"


def test_device_pairs_match_refimpl_and_phase(phased_case):
    genome, m1, m2, truths, wrongs = phased_case
    interleaved = [x for ab in zip(m1, m2) for x in ab]
    cfg = Config(size_kmer=K, max_read_length=80, batch_reads=128,
                 exact=True, estimated_kmers=1 << 15, singletons=1 << 15,
                 junction_capacity=1 << 13, sink_capacity=1 << 14,
                 pair_capacity=1 << 14, paired_ends=True)
    p = Pipeline(cfg)
    p.load_reads(interleaved)
    p.scan_paired(interleaved)

    # device pair counts must equal refimpl's (same hash domain check)
    asm = ExactAssembler(K, paired_ends=True)
    asm.load(m1 + m2)
    asm.scan_pairs(m1, m2)
    from faucet_tpu.core.hashing import pair_key_np
    from faucet_tpu.core.kmer import encode_kmer

    dev_counts = p.pair_counts()
    ref_counts = {}
    for (a, b), n in asm.pairs.items():
        ah, al = encode_kmer(a)
        bh, bl = encode_kmer(b)
        kh, kl = pair_key_np(np.uint32(ah), np.uint32(al),
                             np.uint32(bh), np.uint32(bl))
        key = (int(kh) << 32) | int(kl)
        ref_counts[key] = ref_counts.get(key, 0) + n
    assert dev_counts == ref_counts

    g = p.build()
    g = p.clean_graph(g)
    hit_t, hit_w = _check_phasing(g, truths, wrongs)
    assert hit_t == 2 and hit_w == 0
