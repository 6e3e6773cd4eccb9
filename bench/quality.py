#!/usr/bin/env python
"""Assembly-quality harness: assembled contigs vs GROUND TRUTH at scale.

VERDICT r2 #2: make Mbp-scale assembly quality a tested number. For a
synthetic genome we know the truth exactly, so this harness reports:

  - truth unitig stats (refimpl/unitigs.py on the same genome)
  - n50_vs_truth        = assembled N50 / truth-unitig N50
  - genome_true_frac    = fraction of assembled contig BASES that are
                          exact substrings of the genome (either strand)
  - truth_recovered     = fraction of truth-unitig BASES contained in
                          some assembled contig (weighted by length)
  - misassembly breakdown for contigs that are NOT genome-true:
    longest true prefix/suffix (distinguishes bad tails from chimeras)

Usage (CPU backend, like bench/scale_run.py):
  python bench/quality.py --mbp 0.3 --coverage 30 --err 0.005
  python bench/quality.py --exact            # exact-membership mode
Writes JSON to stdout and optionally --out.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def n50(lengths):
    if not len(lengths):
        return 0
    s = np.sort(np.asarray(lengths))[::-1]
    c = np.cumsum(s)
    return int(s[np.searchsorted(c, c[-1] / 2)])


def longest_true_prefix(c: str, genome: str, lo: int = 0) -> int:
    """Longest prefix of c that is a substring of genome (binary search —
    substring containment of prefixes is monotone)."""
    lo, hi = lo, len(c)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if c[:mid] in genome:
            lo = mid
        else:
            hi = mid - 1
    return lo


def assess(contigs, genome: str, k: int):
    """Per-contig truth assessment against genome (both strands)."""
    from faucet_tpu.core.kmer import revcomp_seq

    gg = genome + "\x00" + revcomp_seq(genome)
    true_bases = 0
    total_bases = 0
    bad = []  # (len, true_prefix, true_suffix)
    for c in contigs:
        total_bases += len(c)
        if c in gg:
            true_bases += len(c)
            continue
        pre = longest_true_prefix(c, gg)
        suf = longest_true_prefix(c[::-1], gg[::-1])
        # credit the true flanks; the middle (or tail) is misassembled
        true_bases += min(len(c), pre + suf) if pre + suf < len(c) \
            else max(pre, suf)
        bad.append((len(c), pre, suf))
    return {
        "genome_true_frac": round(true_bases / max(total_bases, 1), 5),
        "contigs_not_true": len(bad),
        "bad_examples": sorted(bad, reverse=True)[:10],
    }


def truth_recovery(contigs, truth_seqs, genome: str):
    """Fraction of truth-unitig bases contained in some contig. Indexed by
    k-mer-free substring check: concatenate contigs with separators and
    use str.find per truth unitig (truth count is small)."""
    from faucet_tpu.core.kmer import revcomp_seq

    hay = "\x00".join(contigs)
    hay = hay + "\x00" + revcomp_seq(hay.replace("\x00", "\x01"))\
        .replace("\x01", "\x00")
    got = 0
    tot = 0
    missed = []
    for t in truth_seqs:
        tot += len(t)
        if t in hay:
            got += len(t)
        else:
            pre = longest_true_prefix(t, hay)
            suf = longest_true_prefix(t[::-1], hay[::-1])
            got += min(len(t), max(pre, suf))
            missed.append(len(t))
    return {
        "truth_recovered_frac": round(got / max(tot, 1), 5),
        "truth_unitigs_missed": len(missed),
        "missed_lens": sorted(missed, reverse=True)[:10],
    }


def run(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from faucet_tpu import simulate as SIM
    from faucet_tpu.config import Config
    from faucet_tpu.metrics import Metrics
    from faucet_tpu.pipeline import Pipeline, batch_iter
    from refimpl.unitigs import genome_graph

    G = int(args.mbp * 1e6)
    rng = np.random.default_rng(args.seed)
    genome = SIM.genome_with_repeats(rng, G,
                                     n_repeats=max(4, G // 250_000),
                                     repeat_len=400)
    reads = SIM.shred(rng, genome, coverage=args.coverage, read_len=100,
                      err_rate=args.err)
    n_kmers = len(genome) - args.k + 1
    cfg = Config(size_kmer=args.k, max_read_length=100,
                 batch_reads=args.batch,
                 estimated_kmers=n_kmers,
                 singletons=int(len(reads) * 100 * args.err * args.k)
                 + n_kmers,
                 junction_capacity=max(1 << 14, n_kmers // 2),
                 sink_capacity=max(1 << 15, 2 * n_kmers),
                 fp_rate=args.fp, exact=args.exact,
                 junction_detect=args.junction_detect,
                 min_contig_cov=args.min_cov)
    t0 = time.perf_counter()
    p = Pipeline(cfg, Metrics())
    p.load_batches(batch_iter(reads, cfg))
    p.scan_batches(batch_iter(reads, cfg))
    g = p.build()
    if not args.no_clean:
        g = p.clean_graph(g)
    contigs = [g.contigs[i].seq for i in g.live()]
    wall = time.perf_counter() - t0

    tg = genome_graph(genome, args.k)
    truth = [tg.contigs[i].seq for i in tg.live()]
    lens = [len(c) for c in contigs]
    tlens = [len(t) for t in truth]
    rec = {
        "mbp": args.mbp, "coverage": args.coverage, "err": args.err,
        "fp": args.fp, "exact": args.exact, "k": args.k,
        "reads": len(reads), "wall_s": round(wall, 1),
        "contigs": len(contigs), "n50": n50(lens),
        "total_bases": int(sum(lens)),
        "truth_unitigs": len(truth), "truth_n50": n50(tlens),
        "truth_bases": int(sum(tlens)),
        "n50_vs_truth": round(n50(lens) / max(n50(tlens), 1), 4),
        "junctions": int(p.junctions.count),
        "sinks": int(p.sinks.count),
    }
    rec.update(assess(contigs, genome, args.k))
    rec.update(truth_recovery(contigs, truth, genome))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=0.3)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--err", type=float, default=0.005)
    ap.add_argument("--fp", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--no-clean", action="store_true")
    ap.add_argument("--min-cov", type=float, default=2.5)
    ap.add_argument("--junction-detect", default="auto")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rec = run(args)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
