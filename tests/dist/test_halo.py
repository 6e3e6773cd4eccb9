"""Halo-exchange partitioned cleaning == single-host clean()
(VERDICT r2 #4; PARITY.md §config5 item 3).

The graph under test comes from a REAL mini-assembly with planted
structure: repeats (junction nodes + collapse chains), sequencing errors
(tips + low-coverage chimeric bubbles + doubled-error islands), so all
four cleaning rules fire. 8-shard partitioned cleaning with control
messages riding the mesh all_to_all must produce the identical cleaned
contig set.
"""
import copy

import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.dist.halo import PartitionedCleaner
from faucet_tpu.dist.mesh import make_mesh
from faucet_tpu.graph.clean import clean
from faucet_tpu.pipeline import Pipeline

K = 21


@pytest.fixture(scope="module")
def raw_graph():
    rng = np.random.default_rng(77)
    genome = simulate.genome_with_repeats(rng, 12_000, n_repeats=3,
                                          repeat_len=250)
    reads = simulate.shred(rng, genome, coverage=35, read_len=90,
                           err_rate=0.006)
    cfg = Config(size_kmer=K, max_read_length=90, batch_reads=512,
                 estimated_kmers=1 << 15, singletons=1 << 17,
                 junction_capacity=1 << 13, sink_capacity=1 << 15,
                 fp_rate=0.01)
    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)
    return p.build()


def _sig(g):
    return sorted((c.canonical_seq(), c.circular, c.cov)
                  for i in g.live() for c in [g.contigs[i]])


def _assert_same(a, b):
    """Sequences + topology exactly equal; cov within 1% (pairwise
    weighted-average cov is not associative across merge orders — the
    shared node window is re-counted per merge — so collapse order
    shifts it in the 3rd decimal; see dist/halo.py docstring)."""
    assert [(s, c) for s, c, _ in a] == [(s, c) for s, c, _ in b]
    for (_, _, ca), (_, _, cb) in zip(a, b):
        assert abs(ca - cb) <= 0.01 * max(ca, cb, 1.0)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_partitioned_clean_matches_single_host(raw_graph, use_mesh):
    g_seq = copy.deepcopy(raw_graph)
    st = clean(g_seq, max_tip_len=180, min_cov=2.5)
    assert st["tips"] + st["low_cov"] + st["isolated"] > 0, \
        "planted case must exercise the delete rules"
    assert st["collapsed"] > 0, "planted case must exercise collapse"

    mesh = make_mesh(8) if use_mesh else None
    pc = PartitionedCleaner(copy.deepcopy(raw_graph), 8, mesh=mesh)
    stats = pc.clean(max_tip_len=180, min_cov=2.5)
    g_par = pc.result()

    _assert_same(_sig(g_par), _sig(g_seq))
    assert stats["collective_bytes"] > 0
    assert stats["rounds"] >= 2  # fixpoint actually iterated


def _planted_eqlen_bubble():
    """X ==(two equal-length parallel arms)== Y, plus enough flanking
    structure that neither node ever becomes collapse-eligible (the
    planted sequences are synthetic, not orientation-consistent). The
    weak arm sits at 0.5x top cov — ABOVE the 0.25 ratio rule, killable
    only by the EQLEN_RATIO equal-length rule (the ADVICE r3 repro)."""
    from faucet_tpu.graph.model import Contig, ContigGraph, End

    g = ContigGraph(21)
    X = "ACGTG" * 4 + "A"          # valid 21-mer node names (the
    Y = "TTGCA" * 4 + "C"          # partitioned cleaner hashes them)
    for i, (node, s1, s2) in enumerate(((X, 5, 6), (Y, 1, 2))):
        g.add_contig(Contig(seq="ACGT" * 150, cov=18.0,
                            right=End(node, s1)))
        g.add_contig(Contig(seq="TGCA" * 150, cov=17.0,
                            right=End(node, s2)))
    g.add_contig(Contig(seq="A" * 80, cov=18.0, left=End(X, 0),
                        right=End(Y, 5)))         # strong arm
    g.add_contig(Contig(seq="C" * 80, cov=9.0, left=End(X, 1),
                        right=End(Y, 6)))         # weak equal-length arm
    return g


def test_equal_length_bubble_pops_in_both():
    g_seq = _planted_eqlen_bubble()
    st = clean(g_seq, max_tip_len=0, min_cov=0.0, do_tips=False)
    assert st["bubbles"] == 1, "EQLEN rule must fire sequentially"

    pc = PartitionedCleaner(_planted_eqlen_bubble(), 8)
    stats = pc.clean(max_tip_len=0, min_cov=0.0, do_tips=False)
    assert stats["bubbles"] == 1, "EQLEN rule must fire partitioned"
    _assert_same(_sig(pc.result()), _sig(g_seq))


def test_bubbles_fire_in_differential_case(raw_graph):
    """Regression for VERDICT r3 weak #5: the real-assembly differential
    case must exercise the partitioned parallel-arm removal. The
    round-4 relative-chimera rule (clean._classify) now catches most
    error arms BEFORE pop_bubbles' same-node-pair grouping sees them,
    so the assertion covers both rules; the planted EQLEN case above is
    the dedicated bubble-pass exercise."""
    import copy

    pc = PartitionedCleaner(copy.deepcopy(raw_graph), 8)
    stats = pc.clean(max_tip_len=180, min_cov=2.5)
    assert stats["bubbles"] + stats["chimeric"] > 0


def test_exchange_fixed_capacity_discipline():
    """One hot (src, dst) pair must not inflate any buffer: every trip
    moves the same n*n*CAP*W uint32 buffer, the trip count is
    ceil(hottest-pair rows / CAP), and rows arrive intact and in order
    (dist/route.py's overflow-carry discipline; VERDICT r3 #7)."""
    from faucet_tpu.dist.halo import Exchange

    n = 8
    ex = Exchange(n)
    hot = [(7, i, i * 3) for i in range(2000)]   # 90%+ of all rows
    out = [[[] for _ in range(n)] for _ in range(n)]
    out[0][1] = list(hot)
    out[3][4] = [(1, 42)]
    inbox = ex.exchange(out)
    assert inbox[1][0] == [tuple(list(r) + [0] * (Exchange.W - len(r)))
                           for r in hot]
    assert inbox[4][3][0][:2] == (1, 42)
    trips = -(-len(hot) // ex.cap)
    assert ex.rounds == trips
    fixed_buf = n * n * ex.cap * Exchange.W * 4 + n * n * 4
    assert ex.bytes == trips * fixed_buf


def test_partitioned_collapse_only_matches(raw_graph):
    """Deletes disabled: both cleaners reduce to the collapse fixpoint
    (the partitioned one takes more rounds — pairwise matching per round
    — but must land on the same chains)."""
    g2 = copy.deepcopy(raw_graph)
    clean(g2, max_tip_len=0, min_cov=0.0, do_tips=False,
          do_low_cov=False)
    pc = PartitionedCleaner(copy.deepcopy(raw_graph), 8)
    pc.clean(max_tip_len=0, min_cov=0.0, do_tips=False,
             do_low_cov=False)
    _assert_same(_sig(pc.result()), _sig(g2))


@pytest.fixture(scope="module")
def paired_graph():
    """The test_pairs phased-repeat topology assembled with pair capture
    (exact mode): four distinct outer junction families make mate pairs
    spanning each repeat copy discriminative — the minimal case where
    disentangle must fire."""
    rng = np.random.default_rng(4242)
    g = lambda n: simulate.random_genome(rng, n)
    p, q, s, t, r = g(40), g(40), g(40), g(40), g(40)
    A, B, C, D = g(60), g(60), g(60), g(60)
    M = [g(220) for _ in range(6)]
    genome = (p + A + r + B + q + M[0] + s + C + r + D + t + M[1]
              + p + M[2] + q + M[3] + s + M[4] + t + M[5])
    m1, m2 = simulate.shred(rng, genome, coverage=60, read_len=80,
                            circular=True, paired=True, insert=250)
    interleaved = [x for ab in zip(m1, m2) for x in ab]
    cfg = Config(size_kmer=K, max_read_length=80, batch_reads=128,
                 exact=True, estimated_kmers=1 << 15, singletons=1 << 15,
                 junction_capacity=1 << 13, sink_capacity=1 << 14,
                 pair_capacity=1 << 14, paired_ends=True)
    pl = Pipeline(cfg)
    pl.load_reads(interleaved)
    pl.scan_paired(interleaved)
    return pl.build(), pl._pair_count_fn()


def test_partitioned_disentangle_matches_single_host(paired_graph):
    """VERDICT r4 #7: paired-end evidence routed through the halo
    protocol (FAR_INFO/DMERGE/CHAIN_HALF) must reproduce the sequential
    disentangle's contig set exactly."""
    g0, pc_fn = paired_graph
    assert pc_fn is not None, "pair capture produced no pairs"
    g_seq = copy.deepcopy(g0)
    st = clean(g_seq, max_tip_len=160, min_cov=2.5, pair_count=pc_fn,
               min_pairs=2)
    assert st["disentangled"] >= 1, f"sequential disentangle idle: {st}"

    pc = PartitionedCleaner(copy.deepcopy(g0), 8)
    stats = pc.clean(max_tip_len=160, min_cov=2.5, pair_count=pc_fn,
                     min_pairs=2)
    assert stats["disentangled"] >= 1, \
        f"partitioned disentangle idle: {stats}"
    _assert_same(_sig(pc.result()), _sig(g_seq))
