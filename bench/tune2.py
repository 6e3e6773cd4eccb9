#!/usr/bin/env python
"""Second tuning sweep: cascade group size, probe unroll 16/32, fresh
full-stage breakdown at batch 8192 and 16384."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core import scan as SC
from faucet_tpu.core import table as T
from faucet_tpu.kernels.cascade import cascade_insert_fused
from faucet_tpu.kernels.probe import bloom_probe_keys

ITERS = 8
_RTT = None


def timeit_dev(step_fn, init_state, label):
    global _RTT
    if _RTT is None:
        g = jax.jit(lambda: jnp.zeros((), jnp.uint32))
        float(np.asarray(g()))
        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(g()))
        _RTT = (time.perf_counter() - t0) / 3
        print(f"fetch RTT: {_RTT*1e3:.1f} ms", flush=True)

    def loop(state):
        def body(c, _):
            return step_fn(c), None
        out, _ = lax.scan(body, state, None, length=ITERS)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        return sum(l.reshape(-1)[:64].astype(jnp.uint32).sum()
                   for l in leaves)

    f = jax.jit(loop)
    try:
        float(np.asarray(f(init_state)))
    except Exception as e:
        print(f"{label}: COMPILE FAIL {str(e)[:150]}", flush=True)
        return None
    t0 = time.perf_counter()
    float(np.asarray(f(init_state)))
    dt = (time.perf_counter() - t0 - _RTT) / ITERS
    print(f"{label}: {dt*1e3:.1f} ms/iter", flush=True)
    return dt


def main():
    cfg = Config(size_kmer=31, max_read_length=100, batch_reads=8192,
                 estimated_kmers=2_000_000, singletons=8_000_000,
                 junction_capacity=1 << 18, sink_capacity=1 << 21,
                 fp_rate=0.01)
    la = cfg.bloom_a_bits.bit_length() - 1
    lb = cfg.bloom_b_bits.bit_length() - 1
    nha, nhb = cfg.n_hash_a, cfg.n_hash_b
    N = 573440
    rng = np.random.default_rng(0)
    khi = jnp.asarray(rng.integers(0, 1 << 30, size=N).astype(np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64)
                      .astype(np.uint32))
    c0 = BL.make_cascade(cfg)

    def mut(kh):
        return kh * jnp.uint32(2654435761) + jnp.uint32(1)

    for g in (2, 4, 8):
        def cas(s, g=g):
            aw, bw, kh = s
            ba, h1r, h2 = BL._block_h1r_h2(kh, klo, la)
            bb, _, _ = BL._block_h1r_h2(kh, klo, lb)
            aw2, bw2, _ = cascade_insert_fused(aw, bw, ba, bb, h1r, h2,
                                               nha, nhb, group=g)
            return (aw2, bw2, mut(kh))
        timeit_dev(cas, (c0.a_bloom.words, c0.b_bloom.words, khi),
                   f"cascade 573k single-tile, G={g}")

    bw = c0.b_bloom.words
    for unroll in (16, 32):
        def pr(s, u=unroll):
            w, kh = s
            blk, h1r, h2 = BL._block_h1r_h2(kh, klo, lb)
            r = bloom_probe_keys(w, blk, h1r, h2, nhb, unroll=u)
            return (w, mut(kh) + r.sum().astype(jnp.uint32))
        timeit_dev(pr, (bw, khi), f"probe 573k dense, unroll={unroll}")

    # fresh full-stage breakdown at two batch sizes
    for B in (8192, 16384):
        cfgB = Config(size_kmer=31, max_read_length=100, batch_reads=B,
                      estimated_kmers=2_000_000, singletons=8_000_000,
                      junction_capacity=1 << 18, sink_capacity=1 << 21,
                      fp_rate=0.01)
        ncfg = cfgB.node_view()
        genome = rng.integers(0, 4, size=2_000_000, dtype=np.uint8)
        starts = rng.integers(0, genome.size - 100, size=B)
        bases = jnp.asarray(
            np.stack([genome[s:s + 100] for s in starts]).astype(np.uint8))
        lens = jnp.asarray(np.full((B,), 100, np.int32))
        cas0 = BL.make_cascade(cfgB)
        nc0 = BL.make_cascade(ncfg)
        jt = T.make(cfgB.junction_cap,
                    (((8,), jnp.int32), ((8,), jnp.uint16)))
        st = T.make(cfgB.sink_cap, (((), jnp.int32),))

        def lb_step(s):
            c, nc, b = s
            c, nc, _n = SC.load_batch_nodes(c, nc, b, lens, cfgB)
            return (c, nc, b ^ jnp.uint8(1))
        timeit_dev(lb_step, (cas0, nc0, bases), f"load_batch_nodes B={B}")

        def sn_step(s):
            j, sk, b = s
            r = SC.scan_batch(cas0, j, sk, b, lens, cfgB, nc0)
            return (r.junctions, r.sinks, b ^ jnp.uint8(1))
        timeit_dev(sn_step, (jt, st, bases), f"scan_batch nodes B={B}")


if __name__ == "__main__":
    main()
