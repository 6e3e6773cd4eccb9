#!/usr/bin/env python
"""One-shot device profiling: VMEM capacity probe + per-stage timings of
the current stream pipeline.

axon caveat: block_until_ready returns immediately on this backend, so
every stage is timed as a jitted lax.scan of ITERS dependent iterations
ending in a checksum scalar that is FETCHED to host (np.asarray forces
the sync); per-iteration time = (wall - fetch_rtt) / ITERS. A null jit
measures fetch_rtt.

Usage: python bench/micro_profile.py [--stages] [--vmem]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8


def _checksum(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    acc = jnp.zeros((), jnp.uint32)
    for l in leaves:
        f = l.reshape(-1)
        acc = acc + f[:128].astype(jnp.uint32).sum() + \
            f[-128:].astype(jnp.uint32).sum()
    return acc


_RTT = None


def timeit_dev(step_fn, init_state, label, perturb=None):
    """step_fn: state -> state. Times ITERS dependent applications."""
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
        return _checksum(out)

    f = jax.jit(loop)
    float(np.asarray(f(init_state)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(f(init_state)))
    dt = (time.perf_counter() - t0 - _RTT) / ITERS
    print(f"{label}: {dt*1e3:.1f} ms/iter", flush=True)
    return dt


def probe_vmem():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for mb in (4, 8, 10, 12, 16):
        W = mb * (1 << 20) // 4

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.uint32(1)

        try:
            x = jnp.zeros((W // 128, 128), jnp.uint32)
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            np.asarray(f(x))
            print(f"VMEM probe {mb} MB block (x2 in+out): OK", flush=True)
        except Exception as e:
            print(f"VMEM probe {mb} MB block: FAIL {str(e)[:120]}",
                  flush=True)
            break


def profile_stages():
    from faucet_tpu.config import Config
    from faucet_tpu.core import bloom as BL
    from faucet_tpu.core import kmer as KM
    from faucet_tpu.core import scan as SC
    from faucet_tpu.core import table as T

    cfg = Config(size_kmer=31, max_read_length=100, batch_reads=8192,
                 estimated_kmers=2_000_000, singletons=8_000_000,
                 junction_capacity=1 << 18, sink_capacity=1 << 21,
                 fp_rate=0.01)
    B, L = cfg.batch_reads, cfg.max_read_length
    P = cfg.positions_per_read
    print(f"A={cfg.bloom_a_bits//8//2**20}MB B={cfg.bloom_b_bits//8//2**20}"
          f"MB n_hash={cfg.n_hash} windows={B*P}", flush=True)

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=2_000_000, dtype=np.uint8)
    starts = rng.integers(0, genome.size - L, size=B)
    bases_d = jnp.asarray(
        np.stack([genome[s:s + L] for s in starts]).astype(np.uint8))
    lens_d = jnp.asarray(np.full((B,), L, np.int32))

    cascade = BL.make_cascade(cfg)
    view = jax.jit(lambda b, l: KM.kmerize(b, l, 31))(bases_d, lens_d)
    khi = view.canon_hi.reshape(-1)
    klo = view.canon_lo.reshape(-1)
    valid = view.valid.reshape(-1)
    la = cfg.bloom_a_bits.bit_length() - 1
    lb = cfg.bloom_b_bits.bit_length() - 1
    nh = cfg.n_hash

    # mutate keys each iteration so nothing constant-folds; keys stay
    # uniform-random-ish under the multiplicative perturbation
    def mut(c, khi):
        return khi * np.uint32(2654435761) + c.astype(jnp.uint32)

    # --- kmerize ---
    def km_step(s):
        b, acc = s
        v = KM.kmerize(b, lens_d, 31)
        return (b ^ (v.canon_lo[:, :1] & 1).astype(jnp.uint8), acc)
    timeit_dev(km_step, (bases_d, jnp.zeros((), jnp.uint32)), "kmerize")

    # --- 2-key sort (batch counts) ---
    def bc_step(s):
        kh, kl = s
        sh, sl, cnt, rep, _si = BL._batch_counts(kh, kl, valid)
        return (mut(cnt[0], kh), sl)
    timeit_dev(bc_step, (khi, klo), "_batch_counts 2-key sort 573k")

    # --- contains on A (573k row gathers) ---
    def ca_step(s):
        ab, kh = s
        r = BL.bloom_contains(BL.Bloom(ab), kh, klo, valid, nh, la)
        return (ab, mut(r.sum(dtype=jnp.int32), kh))
    timeit_dev(ca_step, (cascade.a_bloom.words, khi),
               "bloom_contains A 573k gathers")

    # --- insert into A (16MB, tiled Pallas) ---
    def ia_step(s):
        ab, kh = s
        nb = BL.bloom_insert(BL.Bloom(ab), kh, klo, valid, nh, la)
        return (nb.words, mut(jnp.zeros((), jnp.int32), kh))
    timeit_dev(ia_step, (cascade.a_bloom.words, khi),
               "bloom_insert A 16MB (8 tiles)")

    # --- insert into B (4MB) ---
    def ib_step(s):
        bb, kh = s
        nb = BL.bloom_insert(BL.Bloom(bb), kh, klo, valid, nh, lb)
        return (nb.words, mut(jnp.zeros((), jnp.int32), kh))
    timeit_dev(ib_step, (cascade.b_bloom.words, khi),
               "bloom_insert B 4MB (1 tile)")

    # --- full cascade_insert ---
    def ci_step(s):
        c, kh = s
        c2 = BL.cascade_insert(c, kh, klo, valid, cfg)
        return (c2, mut(jnp.zeros((), jnp.int32), kh))
    timeit_dev(ci_step, (cascade, khi), "cascade_insert total")

    # --- ext probes: 4.6M row gathers ---
    ehi, elo = jax.jit(functools.partial(KM.slot_ext_pairs, k=31))(
        view.canon_hi, view.canon_lo,
        jnp.where(view.canon_is_fwd, view.rc_hi, view.fwd_hi),
        jnp.where(view.canon_is_fwd, view.rc_lo, view.fwd_lo))

    def ep_step(s):
        bb, eh = s
        r = BL.bloom_contains(BL.Bloom(bb), eh, elo,
                              jnp.ones(eh.shape, bool), nh, lb)
        return (bb, mut(r.sum(dtype=jnp.int32).astype(jnp.uint32),
                        eh.reshape(-1)).reshape(eh.shape))
    timeit_dev(ep_step, (cascade.b_bloom.words, ehi),
               "ext probes 4.6M gathers")

    # --- row runs ---
    solid = jnp.asarray(rng.random((B, P)) < 0.9)
    isj = solid & jnp.asarray(rng.random((B, P)) < 0.02)

    def rr_step(s):
        sol, acc = s
        rs, re, pj, nj, tot, sm, em = SC._row_runs(sol, isj)
        return (jnp.roll(sol, 1, axis=1), acc + tot[0, 0])
    timeit_dev(rr_step, (solid, jnp.zeros((), jnp.int32)),
               "_row_runs two scans P=70")

    # --- compaction (argsort fallback vs Pallas mask_indices) ---
    K = min(B * P, cfg.scan_update_cap)
    flatj = isj.reshape(-1)

    def cp_step(s):
        m, kh = s
        order = jnp.argsort(~m, stable=True)
        return (jnp.roll(m, 7), mut(order[:K].sum(dtype=jnp.int32), kh))
    timeit_dev(cp_step, (flatj, khi), f"compaction argsort 573k->{K}")
    from faucet_tpu.kernels.compact import mask_indices

    def ci_step(s):
        m, kh = s
        idx, cnt = mask_indices(m, K)
        return (jnp.roll(m, 7), mut(idx.sum(dtype=jnp.uint32) + cnt.astype(jnp.uint32), kh))
    timeit_dev(ci_step, (flatj, khi), f"compaction kernel 573k->{K}")

    # --- junction upsert ---
    jt = T.make(cfg.junction_cap, (((8,), jnp.int32), ((8,), jnp.uint16)))
    order = jnp.argsort(~flatj, stable=True)[:K]
    cm = jnp.asarray(flatj)[order]
    chi2, clo2 = khi[order], klo[order]
    cov8 = jnp.ones((K, 8), jnp.int32)
    dist8 = jnp.ones((K, 8), jnp.uint16)

    def ju_step(s):
        t, kh = s
        t2 = T.upsert(t, kh, clo2, (cov8, dist8), cm, modes=("add", "max"))
        return (t2, mut(t2.count, kh))
    timeit_dev(ju_step, (jt, chi2), f"junction upsert {K} lanes")

    # --- sink upsert ---
    st = T.make(cfg.sink_cap, (((), jnp.int32),))

    def su_step(s):
        t, kh = s
        t2 = T.upsert(t, kh, clo2, (jnp.ones((K,), jnp.int32),), cm,
                      modes=("add",))
        return (t2, mut(t2.count, kh))
    timeit_dev(su_step, (st, chi2), f"sink upsert {K} lanes")

    # --- full scan_batch ---
    jt = T.make(cfg.junction_cap, (((8,), jnp.int32), ((8,), jnp.uint16)))
    st = T.make(cfg.sink_cap, (((), jnp.int32),))

    def sb_step(s):
        j, sk, b = s
        r = SC.scan_batch(cascade, j, sk, b, lens_d, cfg)
        return (r.junctions, r.sinks,
                b ^ (r.jm[:, :1]).astype(jnp.uint8))
    timeit_dev(sb_step, (jt, st, bases_d), "scan_batch total")

    # --- full load_batch ---
    def lb_step(s):
        c, b = s
        c2 = SC.load_batch(c, b, lens_d, cfg)
        return (c2, b ^ jnp.uint8(1))
    timeit_dev(lb_step, (cascade, bases_d), "load_batch total")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--vmem", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if args.vmem:
        probe_vmem()
    if args.stages or not args.vmem:
        profile_stages()
