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
