#!/usr/bin/env python
"""Per-stage timing of nodes-mode vs ext8-mode stream steps (on-device
loops; see micro_profile.py for methodology)."""
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

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core import kmer as KM
from faucet_tpu.core import nodes as ND
from faucet_tpu.core import scan as SC
from faucet_tpu.core import table as T
from faucet_tpu.core import u32x2 as u2

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
    float(np.asarray(f(init_state)))
    t0 = time.perf_counter()
    float(np.asarray(f(init_state)))
    dt = (time.perf_counter() - t0 - _RTT) / ITERS
    print(f"{label}: {dt*1e3:.1f} ms/iter", flush=True)


def main():
    cfg = Config(size_kmer=31, max_read_length=100, batch_reads=8192,
                 estimated_kmers=2_000_000, singletons=8_000_000,
                 junction_capacity=1 << 18, sink_capacity=1 << 21,
                 fp_rate=0.01)
    ncfg = cfg.node_view()
    print(f"D={cfg.bloom_d_bits//8//2**20}MB E={cfg.bloom_e_bits//8//2**20}"
          f"MB nh_d={cfg.n_hash_d} nh_e={cfg.n_hash_e}", flush=True)
    B, L = cfg.batch_reads, cfg.max_read_length

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=2_000_000, dtype=np.uint8)
    starts = rng.integers(0, genome.size - L, size=B)
    bases = jnp.asarray(
        np.stack([genome[s:s + L] for s in starts]).astype(np.uint8))
    lens = jnp.asarray(np.full((B,), L, np.int32))
    cascade = BL.make_cascade(cfg)
    node_cascade = BL.make_cascade(ncfg)
    jt = T.make(cfg.junction_cap, (((8,), jnp.int32), ((8,), jnp.uint16)))
    st = T.make(cfg.sink_cap, (((), jnp.int32),))

    def mut_b(b):
        return b ^ jnp.uint8(1)

    # (a) ext8 load
    def la(s):
        c, b = s
        return (SC.load_batch(c, b, lens, cfg), mut_b(b))
    timeit_dev(la, (cascade, bases), "load_batch (ext8)")

    # (b) nodes load
    def lb(s):
        c, nc, b = s
        c, nc, _n = SC.load_batch_nodes(c, nc, b, lens, cfg)
        return (c, nc, mut_b(b))
    timeit_dev(lb, (cascade, node_cascade, bases), "load_batch_nodes")

    # (c) node cascade insert alone (1.15M lanes, ~1% flagged)
    view = KM.kmerize(bases, lens, 31)
    oh, ol = u2.select(view.canon_is_fwd, view.rc_hi, view.rc_lo,
                       view.fwd_hi, view.fwd_lo)
    pk_hi, pk_lo, sk_hi, sk_lo = jax.jit(
        functools.partial(ND.endpoint_keys, k=31))(
        view.canon_hi, view.canon_lo, oh, ol)
    nhi = jnp.concatenate([pk_hi.reshape(-1), sk_hi.reshape(-1)])
    nlo = jnp.concatenate([pk_lo.reshape(-1), sk_lo.reshape(-1)])
    nb = jnp.asarray(rng.random(nhi.shape[0]) < 0.01)

    def nc_step(s):
        nc, kh = s
        nc2 = BL.cascade_insert(nc, kh, nlo, nb, ncfg)
        return (nc2, kh * jnp.uint32(2654435761) + jnp.uint32(1))
    timeit_dev(nc_step, (node_cascade, nhi),
               "node cascade insert 1.15M lanes (1% live)")

    # (d) endpoint key computation alone
    def ep(s):
        b, acc = s
        v = KM.kmerize(b, lens, 31)
        o1, o2 = u2.select(v.canon_is_fwd, v.rc_hi, v.rc_lo, v.fwd_hi,
                           v.fwd_lo)
        a, bb, c, d = ND.endpoint_keys(v.canon_hi, v.canon_lo, o1, o2, 31)
        return (mut_b(b), acc + a[0, 0])
    timeit_dev(ep, (bases, jnp.zeros((), jnp.uint32)),
               "kmerize + endpoint keys")

    # (e) scan with nodes
    def sn(s):
        j, sk, b = s
        r = SC.scan_batch(cascade, j, sk, b, lens, cfg, node_cascade)
        return (r.junctions, r.sinks, mut_b(b))
    timeit_dev(sn, (jt, st, bases), "scan_batch (nodes)")

    # (f) scan ext8
    def se(s):
        j, sk, b = s
        r = SC.scan_batch(cascade, j, sk, b, lens, cfg, None)
        return (r.junctions, r.sinks, mut_b(b))
    timeit_dev(se, (jt, st, bases), "scan_batch (ext8)")

    # (g) E probes alone (1.15M lanes)
    rk_hi, rk_lo, lk_hi, lk_lo = jax.jit(
        functools.partial(ND.probe_keys, k=31))(
        view.canon_hi, view.canon_lo, oh, ol)
    qhi = jnp.concatenate([rk_hi.reshape(-1), lk_hi.reshape(-1)])
    qlo = jnp.concatenate([rk_lo.reshape(-1), lk_lo.reshape(-1)])

    def eq(s):
        nc, kh = s
        r = BL.cascade_solid(nc, kh, qlo, jnp.ones(kh.shape[0], bool),
                             ncfg)
        return (nc, kh + r.sum().astype(jnp.uint32))
    timeit_dev(eq, (node_cascade, qhi), "E probes 1.15M lanes")


if __name__ == "__main__":
    main()
