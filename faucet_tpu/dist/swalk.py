"""Owner-routed frontier walks: explicit all_to_all per hop.

SURVEY.md §7.1.4 ("iterative frontier kernels", north star
"masked-pointer-chase ... all-to-all") / VERDICT r2 #5. The plain sharded
build walks global device arrays under jit and lets XLA choose the
collectives; this module makes the design explicit and measurable: the
frontier's lanes are sharded over the mesh, and every hop's 4-way
extension probes, fp-lookahead probes, and junction lookups ride
dist/route.py's LOSSLESS fixed-capacity all_to_all to the hash-range
owner shard and back. Bit-identical to the local walk by construction
(same membership answers, same lockstep recurrence —
tests/dist/test_swalk.py), with the routed payload bytes counted per
wave call (the "collective-bytes per walk round" metric).

Byte accounting counts the transmitted route buffers: each query round
moves [n_shards, cap] lanes of (key 8B) out and (answer 1B) back, times
the lossless-carry round count — i.e. what actually crosses the mesh,
padding included.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from faucet_tpu.core import bloom as BL
from faucet_tpu.core import table as T
from faucet_tpu.dist import route as R
from faucet_tpu.dist.mesh import AXIS
from faucet_tpu.dist.sharded import _cap_for, _owner
from faucet_tpu.graph import walk as W

I32 = jnp.int32


def _routed_fns(cascade_l, junctions_l, cfg, cfg_local):
    """Oracles closing over SHARD-LOCAL state; queries route to owners."""
    n = cfg.n_shards
    sb = cfg.shard_bits

    def solid_fn(khi, klo, mask):
        shape = khi.shape
        fhi = khi.reshape(-1)
        flo = klo.reshape(-1)
        fm = jnp.asarray(mask).reshape(-1)
        owner = _owner(fhi, flo, sb)
        cap = _cap_for(fhi.shape[0], n)
        got, _ = R.route_query(
            {"hi": fhi, "lo": flo}, owner, fm, n, cap,
            lambda recv, rmask: BL.cascade_solid(
                cascade_l, recv["hi"], recv["lo"], rmask, cfg_local))
        return (got > 0).reshape(shape)

    def junc_fn(khi, klo, mask):
        shape = khi.shape
        fhi = khi.reshape(-1)
        flo = klo.reshape(-1)
        fm = jnp.asarray(mask).reshape(-1)
        owner = _owner(fhi, flo, sb)
        cap = _cap_for(fhi.shape[0], n)
        got, _ = R.route_query(
            {"hi": fhi, "lo": flo}, owner, fm, n, cap,
            lambda recv, rmask: T.lookup(
                junctions_l, recv["hi"], recv["lo"], rmask)[0]
            .astype(jnp.int8))
        return (got > 0).reshape(shape)

    return solid_fn, junc_fn


@partial(jax.jit, static_argnames=("mesh", "n_rounds", "n_steps", "cfg"))
def walk_waves_routed(mesh, cascade, junctions, fr, n_rounds: int,
                      n_steps: int, cfg):
    """walk_waves with lane-sharded frontier and owner-routed probes.

    Returns (frontier, bases u8[W, n_rounds*n_steps], routed_bytes)."""
    cfg_local = cfg.local_shard()

    n = cfg.n_shards

    def body(cascade_l, junctions_l, fr_l):
        solid_fn, junc_fn = _routed_fns(cascade_l, junctions_l, cfg,
                                        cfg_local)
        walk_fn = partial(W.walk_round, solid_fn=solid_fn,
                          junc_fn=junc_fn)
        resolve_fn = partial(W.resolve_ambiguous, solid_fn=solid_fn)
        fr2, bases, r = W.walk_waves(
            cascade_l, junctions_l, fr_l, n_rounds, n_steps, cfg_local,
            walk_fn=walk_fn, resolve_fn=resolve_fn,
            # global continue flag: every shard must run the same number
            # of wave rounds or the routed collectives deadlock
            any_fn=lambda m: jax.lax.pmax(
                jnp.any(m).astype(jnp.int32), AXIS) > 0)
        # routed-byte accounting, analytic from the executed rounds
        # (1 lossless-carry round per query is the invariant the 2x
        # capacity sizing buys; unsent is 0 by construction): per step a
        # lane-sharded frontier of Wl lanes issues one 4Wl-lane solid
        # query + one Wl-lane junction query; each inter-round resolve
        # gathers at most RESOLVE_CAP lanes (walk.resolve_ambiguous lane
        # compaction) and issues the candidate probe (4C) plus
        # fp_lookahead steps of beam-child probes (64C: 4 candidates x
        # 4-slot beam x 4 children). Each routed lane moves 8B of key
        # out and 1B of answer back, times n_shards*cap buffers.
        Wl = fr_l.active.shape[0]
        C = W._resolve_cap(Wl)
        cap = lambda m: _cap_for(m, n)
        step_b = n * (cap(4 * Wl) + cap(Wl)) * 9
        L = int(cfg.fp_lookahead)
        res_b = n * (cap(4 * C) + L * cap(64 * C)) * 9
        # per-round byte constant is a Python int (can exceed 2^31 at
        # large Wl — ADVICE r3); accumulate in float32 so the metric
        # neither overflows nor fails to trace (x64 is disabled)
        bytes_ = r.astype(jnp.float32) * np.float32(n_steps * step_b
                                                    + res_b)
        return fr2, bases, jax.lax.psum(bytes_, AXIS)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()))(cascade, junctions, fr)
