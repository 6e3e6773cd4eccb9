#!/usr/bin/env python
"""Round-2 kernel sweep: two-phase cascade v2 vs the sequential kernel,
sparse-kernel device validation (ADVICE r1 medium), mask-compaction
kernel and payload row-gather timings (scan argsort replacement).

One TPU process, everything batched (compiles are 3-5 min each on the
axon tunnel; block_until_ready is a no-op — on-device loops + scalar
fetch, see micro_profile.py).
"""
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
from faucet_tpu.kernels.compact import mask_indices
from faucet_tpu.kernels.probe import bloom_probe_keys

ITERS = 8
_RTT = None


def fetch(x):
    return np.asarray(jax.device_get(x))


def timeit_dev(step_fn, init_state, label):
    global _RTT
    if _RTT is None:
        g = jax.jit(lambda: jnp.zeros((), jnp.uint32))
        float(fetch(g()))
        t0 = time.perf_counter()
        for _ in range(3):
            float(fetch(g()))
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
        float(fetch(f(init_state)))
    except Exception as e:
        print(f"{label}: COMPILE FAIL {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    float(fetch(f(init_state)))
    dt = (time.perf_counter() - t0 - _RTT) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms/iter", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = Config(size_kmer=31, max_read_length=100, batch_reads=8192,
                 estimated_kmers=2_000_000, singletons=8_000_000,
                 fp_rate=0.01)
    la = cfg.bloom_a_bits.bit_length() - 1
    lb = cfg.bloom_b_bits.bit_length() - 1
    nha, nhb = cfg.n_hash_a, cfg.n_hash_b
    print(f"A=2^{la}b B=2^{lb}b nha={nha} nhb={nhb}", flush=True)

    N = 573440
    rng = np.random.default_rng(0)
    khi = rng.integers(0, 1 << 30, size=N).astype(np.uint32)
    klo = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    khi[N // 2:] = khi[: N - N // 2]   # in-batch duplicates
    klo[N // 2:] = klo[: N - N // 2]
    khi, klo = jnp.asarray(khi), jnp.asarray(klo)
    mask = jnp.asarray(rng.random(N) < 0.97)
    c0 = BL.make_cascade(cfg)

    def mut(kh):
        return kh * jnp.uint32(2654435761) + jnp.uint32(1)

    # ---- correctness first: v2 == old dense on device --------------------
    @jax.jit
    def run_both(c, khi, klo, mask):
        ba, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        ba = jnp.where(mask, ba, SENTINEL)
        a1, b1, n1 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          two_phase=False)
        a2, b2, n2 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          two_phase=True)
        return (jnp.array_equal(a1, a2), jnp.array_equal(b1, b2),
                jnp.array_equal(n1, n2))

    ea, eb, en = run_both(c0, khi, klo, mask)
    print(f"v2(G=8) == sequential on device: A={bool(fetch(ea))} "
          f"B={bool(fetch(eb))} new_b={bool(fetch(en))}", flush=True)

    # ---- sparse kernel vs dense at 3% live (ADVICE r1 medium) ------------
    @jax.jit
    def run_sparse_check(c, khi, klo, live):
        ba, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        ba = jnp.where(live, ba, SENTINEL)
        a1, b1, n1 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          two_phase=False)
        a2, b2, n2 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          live=live, sparse=True)
        return (jnp.array_equal(a1, a2), jnp.array_equal(b1, b2),
                jnp.array_equal(n1, n2))

    live3 = jnp.asarray(rng.random(N) < 0.03)
    ea, eb, en = run_sparse_check(c0, khi, klo, live3)
    print(f"sparse(3% live) == dense on device: A={bool(fetch(ea))} "
          f"B={bool(fetch(eb))} new_b={bool(fetch(en))}", flush=True)

    # ---- bad-group rate at bench shapes ----------------------------------
    from faucet_tpu.kernels.cascade import _group_bad

    @jax.jit
    def badrate(khi, klo, mask):
        ba, _h1r, _h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        ba = jnp.where(mask, ba, SENTINEL)
        out = []
        for G in (8, 16):
            out.append(_group_bad(ba, bb, G).mean())
        return out

    r8, r16 = badrate(khi, klo, mask)
    print(f"bad-group rate: G=8 {float(fetch(r8)):.3f}  "
          f"G=16 {float(fetch(r16)):.3f}", flush=True)

    # ---- timing: cascade variants ----------------------------------------
    def cas_step(two_phase, G=None, cond=False):
        def step(s):
            aw, bw, kh = s
            ba, h1r, h2 = BL._block_h1r_h2(kh, klo, la)
            bb, _, _ = BL._block_h1r_h2(kh, klo, lb)
            ba = jnp.where(mask, ba, SENTINEL)
            aw2, bw2, _nb = cascade_insert_fused(
                aw, bw, ba, bb, h1r, h2, nha, nhb,
                two_phase=two_phase, group=G, cond_store=cond)
            return (aw2, bw2, mut(kh))
        return step

    init = (c0.a_bloom.words, c0.b_bloom.words, khi)
    timeit_dev(cas_step(True, 8), init, "cascade v2 G=8, 573k")
    timeit_dev(cas_step(True, 8, True), init,
               "cascade v2 G=8 cond-store, 573k")
    timeit_dev(cas_step(True, 16, True), init,
               "cascade v2 G=16 cond-store, 573k")

    # steady state: every key already solid
    @jax.jit
    def presat(c):
        ba, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        aw, bw, _ = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                         ba, bb, h1r, h2, nha, nhb,
                                         two_phase=True)
        aw, bw, _ = cascade_insert_fused(aw, bw, ba, bb, h1r, h2, nha,
                                         nhb, two_phase=True)
        return aw, bw

    aw_s, bw_s = presat(c0)

    def steady_step(s):
        aw, bw, kh = s
        ba, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        ba = jnp.where(mask, ba, SENTINEL)
        aw2, bw2, _nb = cascade_insert_fused(aw, bw, ba, bb, h1r, h2,
                                             nha, nhb, two_phase=True,
                                             cond_store=True)
        return (aw2, bw2, mut(kh))
    timeit_dev(steady_step, (aw_s, bw_s, khi),
               "cascade v2 G=8 cond-store, 573k, steady (all in B)")

    # cond-store == plain-store on device (semantic no-op check)
    @jax.jit
    def run_cond_eq(c):
        ba, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        bb, _, _ = BL._block_h1r_h2(khi, klo, lb)
        ba = jnp.where(mask, ba, SENTINEL)
        a1, b1, n1 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          two_phase=True, cond_store=False)
        a2, b2, n2 = cascade_insert_fused(c.a_bloom.words, c.b_bloom.words,
                                          ba, bb, h1r, h2, nha, nhb,
                                          two_phase=True, cond_store=True)
        return (jnp.array_equal(a1, a2), jnp.array_equal(b1, b2),
                jnp.array_equal(n1, n2))

    ea, eb, en = run_cond_eq(c0)
    print(f"cond-store == plain on device: A={bool(fetch(ea))} "
          f"B={bool(fetch(eb))} new_b={bool(fetch(en))}", flush=True)

    # ---- sparse kernel timing at node-insert densities ---------------------
    for dens in (0.20, 0.03):
        lv = jnp.asarray(rng.random(N) < dens)

        def sp_step(s, lv=lv):
            aw, bw, kh = s
            ba, h1r, h2 = BL._block_h1r_h2(kh, klo, la)
            bb, _, _ = BL._block_h1r_h2(kh, klo, lb)
            ba = jnp.where(lv, ba, SENTINEL)
            aw2, bw2, _nb = cascade_insert_fused(
                aw, bw, ba, bb, h1r, h2, nha, nhb, live=lv, sparse=True)
            return (aw2, bw2, mut(kh))
        timeit_dev(sp_step, init, f"cascade sparse {int(dens*100)}% live,"
                                  f" 573k lanes")

    # ---- probe reference point -------------------------------------------
    def probe_step(s):
        bw, kh = s
        blk, h1r, h2 = BL._block_h1r_h2(kh, klo, lb)
        r = bloom_probe_keys(bw, blk, h1r, h2, nhb)
        return (bw, mut(kh) + r.sum().astype(jnp.uint32))
    timeit_dev(probe_step, (bw_s, khi), "probe 573k (reference)")

    # ---- compaction kernel + payload row-gather ---------------------------
    jm = jnp.asarray(rng.random(N) < 0.015)
    idx_ref = np.nonzero(np.asarray(jm))[0]

    @jax.jit
    def comp(jm):
        return mask_indices(jm, 8192)

    idx, cnt = comp(jm)
    k = min(int(fetch(cnt)), 8192)
    ok = np.array_equal(fetch(idx)[:k], idx_ref[:k].astype(np.uint32))
    print(f"mask_indices on device correct: {ok} (count {int(fetch(cnt))})",
          flush=True)

    def comp_step(s):
        m, acc = s
        idx, cnt = mask_indices(m, 8192)
        return (jnp.roll(m, 1), acc + cnt + idx[0].astype(jnp.int32))
    timeit_dev(comp_step, (jm, jnp.zeros((), jnp.int32)),
               "mask_indices 573k @1.5% live")

    payload = jnp.asarray(
        rng.integers(0, 1 << 32, size=(N, 8), dtype=np.uint64)
        .astype(np.uint32))

    def gath_step(s):
        idx, acc = s
        rows = jnp.take(payload, idx.astype(jnp.int32), axis=0)
        return (idx + 1, acc + rows[:, 0].sum())
    timeit_dev(gath_step,
               (jnp.arange(8192, dtype=jnp.uint32) * 64,
                jnp.zeros((), jnp.uint32)),
               "row-gather 8192x8 u32 from [573440,8]")

    # argsort reference (what the scan does today)
    def argsort_step(s):
        m, acc = s
        order = jnp.argsort(~m, stable=True)
        return (jnp.roll(m, 1), acc + order[:8192].sum().astype(jnp.uint32))
    timeit_dev(argsort_step, (jm, jnp.zeros((), jnp.uint32)),
               "argsort compaction 573k (current scan)")


if __name__ == "__main__":
    main()
