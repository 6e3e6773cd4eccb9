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


def test_capture_pairs_lossless_above_chunk():
    """Junction-dense mates (> J_CHUNK distinct junctions per row) must
    lose NO pairs (VERDICT r2 weak #5: the old version silently kept only
    the first 32 per mate)."""
    import jax.numpy as jnp

    from faucet_tpu.core import scan as SC
    from faucet_tpu.core import table as T
    from faucet_tpu.core.hashing import pair_key_np
    from faucet_tpu.graph.build import extract_table

    rng = np.random.default_rng(7)
    B, P = 3, 120
    nj = SC.J_CHUNK + 19  # 51 distinct junctions per row, with repeats

    def mk():
        codes = rng.integers(1, 1 << 30, size=(B, P)).astype(np.uint64)
        jm = np.zeros((B, P), bool)
        for r in range(B):
            pos = rng.choice(P, size=nj + 10, replace=False)
            jm[r, pos] = True
            # duplicate some junction codes within the row (dedup path)
            codes[r, pos[nj:]] = codes[r, pos[:10]]
        return (jm, (codes >> np.uint64(32)).astype(np.uint32),
                (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    jm1, hi1, lo1 = mk()
    jm2, hi2, lo2 = mk()
    mkres = lambda jm, hi, lo: SC.ScanResult(
        None, None, None, None, jnp.asarray(jm), jnp.asarray(hi),
        jnp.asarray(lo))
    pairs = T.make(1 << 15, (((), jnp.int32),))
    pairs = SC.capture_pairs(pairs, mkres(jm1, hi1, lo1),
                             mkres(jm2, hi2, lo2))

    want = {}
    for r in range(B):
        aset = {(int(h) << 32) | int(l)
                for h, l in zip(hi1[r][jm1[r]], lo1[r][jm1[r]])}
        bset = {(int(h) << 32) | int(l)
                for h, l in zip(hi2[r][jm2[r]], lo2[r][jm2[r]])}
        assert len(aset) == nj and len(bset) == nj
        for a in aset:
            for b in bset:
                kh, kl = pair_key_np(
                    np.uint32(a >> 32), np.uint32(a & 0xFFFFFFFF),
                    np.uint32(b >> 32), np.uint32(b & 0xFFFFFFFF))
                key = (int(kh) << 32) | int(kl)
                want[key] = want.get(key, 0) + 1
    t = extract_table(pairs)
    got = {(int(h) << 32) | int(l): int(c)
           for h, l, c in zip(t["hi"], t["lo"], t["v0"])}
    assert got == want
    assert sum(got.values()) == B * nj * nj  # nothing dropped
