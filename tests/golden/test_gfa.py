"""GFA emission consistency (SURVEY.md §A.8: overlap = k-1).

Default emission is unitig-convention: every L line describes a real
(k-1)-base overlap, and walking S/L lines with (k-1)-base joins must
reconstruct the underlying genome sequence (VERDICT r1 #7 "done"
criterion). The legacy overlap="k" form is also checked.
"""
import numpy as np

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.out.gfa import write_gfa
from faucet_tpu.pipeline import Pipeline


def _parse_gfa(path):
    segs, links = {}, []
    for line in open(path):
        f = line.rstrip("\n").split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "L":
            links.append((f[1], f[2], f[3], f[4], f[5]))
    return segs, links


def _assemble(rng, genome):
    reads = simulate.shred(rng, genome, 40, 100, circular=True,
                           err_rate=0.003)
    cfg = Config(size_kmer=21, max_read_length=100, batch_reads=256,
                 estimated_kmers=1 << 15, singletons=1 << 15,
                 junction_capacity=1 << 13, sink_capacity=1 << 15)
    p = Pipeline(cfg)
    return p.run_file_mode(reads, reads), cfg


def test_gfa_k_links_describe_real_overlaps(tmp_path, rng):
    genome = simulate.genome_with_repeats(rng, 4000, n_repeats=3,
                                          repeat_len=250)
    g, cfg = _assemble(rng, genome)
    path = str(tmp_path / "x.gfa")
    write_gfa(g, path, overlap="k")
    segs, links = _parse_gfa(path)
    assert len(segs) >= 3 and len(links) >= 2
    k = cfg.size_kmer
    for a, sa, b, sb, ov in links:
        assert ov == f"{k}M"
        A = segs[a] if sa == "+" else revcomp_seq(segs[a])
        B = segs[b] if sb == "+" else revcomp_seq(segs[b])
        assert A[-k:] == B[:k], (
            f"link {a}{sa}->{b}{sb} does not overlap by {k}")


def test_gfa_km1_walk_reconstructs_genome(tmp_path, rng):
    genome = simulate.genome_with_repeats(rng, 4000, n_repeats=3,
                                          repeat_len=250)
    g, cfg = _assemble(rng, genome)
    k = cfg.size_kmer
    path = str(tmp_path / "y.gfa")
    write_gfa(g, path)  # default: k-1
    segs, links = _parse_gfa(path)
    assert len(segs) >= 3 and len(links) >= 2
    # every link is a true (k-1)-overlap
    for a, sa, b, sb, ov in links:
        assert ov == f"{k-1}M"
        A = segs[a] if sa == "+" else revcomp_seq(segs[a])
        B = segs[b] if sb == "+" else revcomp_seq(segs[b])
        assert A[-(k - 1):] == B[: k - 1], (
            f"link {a}{sa}->{b}{sb} does not overlap by {k-1}")
    # greedy S/L walk with (k-1)-joins must reproduce genome substrings
    # longer than any single segment: follow each link once and check
    # the joined sequence occurs in the (circular, double-strand) genome
    doubled = genome + genome
    both = doubled + "#" + revcomp_seq(doubled)
    joined_longer = 0
    for a, sa, b, sb, _ in links:
        A = segs[a] if sa == "+" else revcomp_seq(segs[a])
        B = segs[b] if sb == "+" else revcomp_seq(segs[b])
        joined = A + B[k - 1:]
        assert joined in both or revcomp_seq(joined) in both, (
            f"joined {a}{sa}->{b}{sb} is not genomic")
        if len(joined) > max(len(A), len(B)):
            joined_longer += 1
    assert joined_longer >= 2
