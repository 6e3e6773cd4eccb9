#!/usr/bin/env python
"""On-TPU validation + timing of the fused cascade and probe kernels.

Correctness: compiled kernels vs the XLA reference formulations, compared
ON DEVICE (only a scalar equality flag crosses the tunnel — host<->device
transfers run at ~minutes/MB here).

Timing: on-device lax.scan loops (see micro_profile.py; block_until_ready
is a no-op on this backend).
"""
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
from faucet_tpu.kernels.cascade import SENTINEL, cascade_insert_fused
from faucet_tpu.kernels.probe import bloom_probe_keys

ITERS = 8


def fetch_scalar(x):
    return np.asarray(jax.device_get(x))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = Config(size_kmer=31, max_read_length=100, batch_reads=8192,
                 estimated_kmers=2_000_000, singletons=8_000_000,
                 fp_rate=0.01)
    la = cfg.bloom_a_bits.bit_length() - 1
    lb = cfg.bloom_b_bits.bit_length() - 1
    nha, nhb = cfg.n_hash_a, cfg.n_hash_b
    print(f"A=2^{la}b B=2^{lb}b n_hash_a={nha} n_hash_b={nhb}", flush=True)

    N = 573440
    rng = np.random.default_rng(0)
    khi = jnp.asarray(rng.integers(0, 1 << 30, size=N).astype(np.uint32))
    klo = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64)
                      .astype(np.uint32))
    # force duplicates (cascade promotion paths)
    khi = khi.at[N // 2:].set(khi[: N - N // 2])
    klo = klo.at[N // 2:].set(klo[: N - N // 2])
    mask = jnp.asarray(rng.random(N) < 0.97)

    c0 = BL.make_cascade(cfg)

    # ---- correctness: fused cascade vs XLA formulation -------------------
    @jax.jit
    def xla_path(c, khi, klo, mask):
        # the sort+count formulation, with the pure-XLA gather/scatter
        # internals (bloom_contains/insert would auto-select the kernels
        # on this backend)
        skhi, sklo, counts, rep, _sidx = BL._batch_counts(khi, klo, mask)
        block, bits = BL._block_and_bits(skhi, sklo, nha, la)
        rows = c.a_bloom.words.reshape(-1, BL.BLOCK_WORDS)[block]
        w = jnp.take_along_axis(rows, (bits >> jnp.uint32(5))
                                .astype(jnp.int32), axis=-1)
        in_a = jnp.all((w >> (bits & jnp.uint32(31))) & 1 == 1,
                       axis=-1) & rep
        add_b = rep & (in_a | (counts >= 2))
        add_a = rep & ~in_a
        aw = _xla_insert(c.a_bloom, skhi, sklo, add_a, nha, la)
        bw = _xla_insert(c.b_bloom, skhi, sklo, add_b, nhb, lb)
        return aw.words, bw.words

    def _xla_insert(b, khi, klo, mask, nh, l2):
        pos = BL._positions(khi, klo, nh, l2).reshape(-1)
        m = jnp.broadcast_to(mask[:, None],
                             (mask.shape[0], nh)).reshape(-1)
        pos = jnp.where(m, pos, jnp.uint32(0xFFFFFFFF))
        pos = jax.lax.sort(pos)
        uniq = jnp.concatenate([jnp.ones((1,), bool),
                                pos[1:] != pos[:-1]]) \
            & (pos != jnp.uint32(0xFFFFFFFF))
        word = pos >> jnp.uint32(5)
        one = jnp.where(uniq, jnp.uint32(1) << (pos & jnp.uint32(31)),
                        jnp.uint32(0))
        new_word = jnp.concatenate([jnp.ones((1,), bool),
                                    word[1:] != word[:-1]])
        seg = jnp.cumsum(new_word.astype(jnp.int32)) - 1
        n = pos.shape[0]
        orv = jax.ops.segment_sum(one, seg, num_segments=n,
                                  indices_are_sorted=True)
        segword = jax.ops.segment_max(
            jnp.where(uniq, word, jnp.uint32(0)), seg, num_segments=n,
            indices_are_sorted=True)
        seg_live = jax.ops.segment_max(uniq.astype(jnp.int32), seg,
                                       num_segments=n,
                                       indices_are_sorted=True) > 0
        W = b.words.shape[0]
        dead = jnp.uint32(W) + jnp.arange(n, dtype=jnp.uint32)
        idx = jnp.where(seg_live, segword, dead)
        cur = b.words.at[jnp.where(seg_live, segword, 0)].get(mode="clip")
        return BL.Bloom(words=b.words.at[idx].set(
            cur | orv, mode="drop", indices_are_sorted=True,
            unique_indices=True))

    t0 = time.perf_counter()
    aw_ref, bw_ref = xla_path(c0, khi, klo, mask)

    @jax.jit
    def fused_path(c, khi, klo, mask):
        block_a, h1r, h2 = BL._block_h1r_h2(khi, klo, la)
        block_b, _, _ = BL._block_h1r_h2(khi, klo, lb)
        block_a = jnp.where(mask, block_a, SENTINEL)
        aw, bw, _nb = cascade_insert_fused(c.a_bloom.words,
                                           c.b_bloom.words, block_a,
                                           block_b, h1r, h2, nha, nhb)
        return aw, bw

    aw_new, bw_new = fused_path(c0, khi, klo, mask)
    eq_a = fetch_scalar(jnp.array_equal(aw_ref, aw_new))
    eq_b = fetch_scalar(jnp.array_equal(bw_ref, bw_new))
    print(f"cascade fused == XLA: A {bool(eq_a)} B {bool(eq_b)} "
          f"(compile+check {time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- correctness: probe kernel vs XLA gather --------------------------
    @jax.jit
    def probe_ref(bw, khi, klo, mask):
        block, bits = BL._block_and_bits(khi, klo, nhb, lb)
        rows = bw.reshape(-1, BL.BLOCK_WORDS)[block]
        w = jnp.take_along_axis(rows, (bits >> jnp.uint32(5))
                                .astype(jnp.int32), axis=-1)
        return jnp.all((w >> (bits & jnp.uint32(31))) & 1 == 1,
                       axis=-1) & mask

    @jax.jit
    def probe_new(bw, khi, klo, mask):
        block, h1r, h2 = BL._block_h1r_h2(khi, klo, lb)
        block = jnp.where(mask, block, SENTINEL)
        return bloom_probe_keys(bw, block, h1r, h2, nhb)

    want = probe_ref(bw_new, khi, klo, mask)
    got = probe_new(bw_new, khi, klo, mask)
    eq_p = fetch_scalar(jnp.array_equal(want, got))
    npos = fetch_scalar(got.sum())
    print(f"probe kernel == XLA gather: {bool(eq_p)} (hits {npos})",
          flush=True)

    # ---- timing ----------------------------------------------------------
    g = jax.jit(lambda: jnp.zeros((), jnp.uint32))
    fetch_scalar(g())
    t0 = time.perf_counter()
    for _ in range(3):
        fetch_scalar(g())
    rtt = (time.perf_counter() - t0) / 3
    print(f"fetch RTT: {rtt*1e3:.1f} ms", flush=True)

    def timeit_dev(step, init, label):
        def loop(s):
            def body(c, _):
                return step(c), None
            out, _ = lax.scan(body, s, None, length=ITERS)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(l.reshape(-1)[:64].astype(jnp.uint32).sum()
                       for l in leaves)
        f = jax.jit(loop)
        fetch_scalar(f(init))
        t0 = time.perf_counter()
        fetch_scalar(f(init))
        dt = (time.perf_counter() - t0 - rtt) / ITERS
        print(f"{label}: {dt*1e3:.1f} ms/iter", flush=True)

    def mut(kh, c):
        return kh * jnp.uint32(2654435761) + c

    def cas_step(s):
        aw, bw, kh = s
        block_a, h1r, h2 = BL._block_h1r_h2(kh, klo, la)
        block_b, _, _ = BL._block_h1r_h2(kh, klo, lb)
        block_a = jnp.where(mask, block_a, SENTINEL)
        aw2, bw2, _nb = cascade_insert_fused(aw, bw, block_a, block_b,
                                             h1r, h2, nha, nhb)
        return (aw2, bw2, mut(kh, jnp.uint32(1)))
    timeit_dev(cas_step, (c0.a_bloom.words, c0.b_bloom.words, khi),
               f"fused cascade 573k keys (A 16MB, nh={nha}/{nhb})")

    def probe_step(s):
        bw, kh = s
        block, h1r, h2 = BL._block_h1r_h2(kh, klo, lb)
        r = bloom_probe_keys(bw, block, h1r, h2, nhb)
        return (bw, mut(kh, r.sum().astype(jnp.uint32)))
    timeit_dev(probe_step, (bw_new, khi),
               f"probe kernel 573k keys (B 4MB, nh={nhb})")

    N9 = N * 8
    khi9 = jnp.concatenate([mut(khi, jnp.uint32(i)) for i in range(8)])
    klo9 = jnp.concatenate([klo] * 8)

    def probe8_step(s):
        bw, kh = s
        block, h1r, h2 = BL._block_h1r_h2(kh, klo9, lb)
        r = bloom_probe_keys(bw, block, h1r, h2, nhb)
        return (bw, mut(kh, r.sum().astype(jnp.uint32)))
    timeit_dev(probe8_step, (bw_new, khi9),
               f"probe kernel {N9//1000}k keys (ext-probe scale)")


if __name__ == "__main__":
    main()
