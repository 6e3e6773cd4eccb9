#!/usr/bin/env python
"""Scale validation (VERDICT r1 #4): end-to-end assembly on a multi-Mbp
repeat-structured synthetic, reporting per-phase wall-clock.

The point is to demonstrate that NO phase is host-Python-bound at scale
— the graph build/clean phases run on vectorized numpy arrays (round-2
rewrite) and must stay a small fraction of the stream phases.

Environment note: the axon TPU tunnel moves host<->device data at
~MB/min, so a host-side graph phase against device tables is tunnel-
bound THERE, not framework-bound; this harness therefore runs on the
local CPU backend by default (honest host-side timing; the TPU stream
rate is bench.py's job). Use --platform to override.

Writes bench/scale_run.json:
  {genome_mbp, reads, phase_s: {load, scan, walk, build, clean,
   extract}, contigs, n50, genome_recovered_frac}
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
    if not lengths:
        return 0
    s = np.sort(np.asarray(lengths))[::-1]
    c = np.cumsum(s)
    return int(s[np.searchsorted(c, c[-1] / 2)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=4.0)
    ap.add_argument("--coverage", type=float, default=12.0)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--out", default=os.path.join(REPO, "bench",
                                                  "scale_run.json"))
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from faucet_tpu import simulate as SIM
    from faucet_tpu.config import Config
    from faucet_tpu.metrics import Metrics
    from faucet_tpu.pipeline import Pipeline, batch_iter

    G = int(args.mbp * 1e6)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    genome = SIM.genome_with_repeats(rng, G, n_repeats=max(4, G // 250_000),
                                     repeat_len=400)
    reads = SIM.shred(rng, genome, coverage=args.coverage, read_len=100,
                      err_rate=0.005)
    t_synth = time.perf_counter() - t0
    n_kmers = len(genome) - args.k + 1
    cfg = Config(size_kmer=args.k, max_read_length=100,
                 batch_reads=args.batch,
                 estimated_kmers=n_kmers,
                 singletons=int(len(reads) * 100 * 0.005 * args.k) + n_kmers,
                 junction_capacity=1 << 20, sink_capacity=1 << 21,
                 fp_rate=0.01)
    m = Metrics()
    p = Pipeline(cfg, m)
    print(f"[scale] genome={args.mbp}Mbp reads={len(reads)} "
          f"A={cfg.bloom_a_bits >> 23}MB B={cfg.bloom_b_bits >> 23}MB",
          file=sys.stderr, flush=True)

    phase_s = {}

    def timed(name, fn):
        t = time.perf_counter()
        r = fn()
        phase_s[name] = round(time.perf_counter() - t, 2)
        print(f"[scale] {name}: {phase_s[name]}s", file=sys.stderr,
              flush=True)
        return r

    timed("load", lambda: p.load_batches(batch_iter(reads, cfg)))
    timed("scan", lambda: p.scan_batches(batch_iter(reads, cfg)))
    g = timed("graph_build", p.build)
    g = timed("clean", lambda: p.clean_graph(g))
    contigs = timed("extract",
                    lambda: [g.contigs[i].seq for i in g.live()])

    # recovered fraction: contig bases that exactly tile the genome
    # (quick containment check on a sample to stay cheap at scale)
    from faucet_tpu.core.kmer import revcomp_seq

    sample = contigs[:2000]
    hit = sum(1 for c in sample
              if c in genome or revcomp_seq(c) in genome)
    lens = [len(c) for c in contigs]
    rec = {
        "genome_mbp": args.mbp,
        "reads": len(reads),
        "synth_s": round(t_synth, 2),
        "phase_s": phase_s,
        "contigs": len(contigs),
        "n50": n50(lens),
        "total_contig_bases": int(sum(lens)),
        "sampled_contigs_matching_genome": f"{hit}/{len(sample)}",
        "platform": args.platform,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
