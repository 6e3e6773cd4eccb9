#!/usr/bin/env python
"""Kernel tuning sweep: cascade A-tile size, probe unroll (on-device
loops; micro_profile.py methodology)."""
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
from faucet_tpu.kernels.cascade import SENTINEL, cascade_insert_fused
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
    mask = jnp.ones((N,), bool)

    def mut(kh):
        return kh * jnp.uint32(2654435761) + jnp.uint32(1)

    for tile_mb in (2, 4, 8, 16):
        tw = tile_mb * (1 << 20) // 4

        def cas(s, tw=tw):
            aw, bw, kh = s
            ba, h1r, h2 = BL._block_h1r_h2(kh, klo, la)
            bb, _, _ = BL._block_h1r_h2(kh, klo, lb)
            aw2, bw2, _ = cascade_insert_fused(aw, bw, ba, bb, h1r, h2,
                                               nha, nhb, tile_override=tw)
            return (aw2, bw2, mut(kh))
        timeit_dev(cas, (c0.a_bloom.words, c0.b_bloom.words, khi),
                   f"cascade 573k, A tile {tile_mb}MB "
                   f"({(16*(1<<20)//4)//tw} tiles)")

    bw = c0.b_bloom.words
    for unroll in (2, 4, 8, 16):
        def pr(s, u=unroll):
            w, kh = s
            blk, h1r, h2 = BL._block_h1r_h2(kh, klo, lb)
            r = bloom_probe_keys(w, blk, h1r, h2, nhb, unroll=u)
            return (w, mut(kh) + r.sum().astype(jnp.uint32))
        timeit_dev(pr, (bw, khi), f"probe 573k dense, unroll={unroll}")

    # sentinel-heavy probe (ext-probe mask shape: ~38% masked)
    blk0, h1r0, h20 = BL._block_h1r_h2(khi, klo, lb)
    smask = jnp.asarray(rng.random(N) < 0.62)
    blk_m = jnp.where(smask, blk0, SENTINEL)

    def prs(s):
        w, kh = s
        r = bloom_probe_keys(w, blk_m, h1r0 + kh[0], h20, nhb)
        return (w, mut(kh) + r.sum().astype(jnp.uint32))
    timeit_dev(prs, (bw, khi), "probe 573k, 38% sentinel, unroll=4")


if __name__ == "__main__":
    main()
