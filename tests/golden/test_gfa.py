"""GFA emission consistency: every L line must describe a real k-base
overlap between its two segments in the stated orientations
(SURVEY.md §A.8; graph/model.py docstring invariants)."""
import numpy as np

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core.kmer import revcomp_seq
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


def test_gfa_links_describe_real_overlaps(tmp_path, rng):
    genome = simulate.genome_with_repeats(rng, 4000, n_repeats=3,
                                          repeat_len=250)
    reads = simulate.shred(rng, genome, 40, 100, circular=True,
                           err_rate=0.003)
    cfg = Config(size_kmer=21, max_read_length=100, batch_reads=256,
                 estimated_kmers=1 << 15, singletons=1 << 15,
                 junction_capacity=1 << 13, sink_capacity=1 << 14)
    p = Pipeline(cfg)
    g = p.run_file_mode(reads, reads)
    from faucet_tpu.out.gfa import write_gfa

    path = str(tmp_path / "x.gfa")
    write_gfa(g, path)
    segs, links = _parse_gfa(path)
    assert len(segs) >= 3 and len(links) >= 2
    k = cfg.size_kmer
    for a, sa, b, sb, ov in links:
        assert ov == f"{k}M"
        A = segs[a] if sa == "+" else revcomp_seq(segs[a])
        B = segs[b] if sb == "+" else revcomp_seq(segs[b])
        assert A[-k:] == B[:k], (
            f"link {a}{sa}->{b}{sb} does not overlap by {k}")
