"""Fixed-capacity all-to-all k-mer routing (runs inside shard_map).

Reference status: no communication layer exists in the reference
(single process, SURVEY.md §2.2); this is the TPU-native equivalent the
north star mandates — k-mers travel to the shard that owns their hash
range via `lax.all_to_all` over ICI/DCN, with static per-peer bucket
capacity (XLA needs fixed shapes; SURVEY.md §7.3 "hard parts" #1).

Overflow policy: items beyond a peer bucket's capacity are counted and
dropped by `route()`; callers size capacity at 2x the binomial mean so
drops are vanishing, and surface the counter in metrics. (A carry-to-
next-round loop is the planned refinement.)

Reply routing: `route()` also returns the (owner, rank, ok) placement of
every sent item; `route_back()` inverts the exchange so per-item answers
land back at their origin lanes — the probe/answer round trip of
SURVEY.md §5 "Distributed communication backend".
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from faucet_tpu.dist.mesh import AXIS

I32 = jnp.int32


class RouteInfo(NamedTuple):
    owner: jnp.ndarray   # [n] int32 destination shard per item
    rank: jnp.ndarray    # [n] int32 slot within the peer bucket
    ok: jnp.ndarray      # [n] bool: item was actually sent
    dropped: jnp.ndarray  # [] int32 overflow count


def bucketize(owner, mask, n_shards: int, cap: int) -> RouteInfo:
    """Assign each masked item a (owner, rank<cap) bucket slot."""
    n = owner.shape[0]
    key = jnp.where(mask, owner.astype(I32), n_shards)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    idx = jnp.arange(n, dtype=I32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    group_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank_sorted = idx - group_start
    rank = jnp.zeros((n,), I32).at[order].set(rank_sorted,
                                              unique_indices=True)
    ok = mask & (rank < cap)
    dropped = jnp.sum(mask & (rank >= cap), dtype=I32)
    return RouteInfo(owner=key, rank=rank, ok=ok, dropped=dropped)


def _to_buckets(values, info: RouteInfo, n_shards: int, cap: int, fill):
    buf = jnp.full((n_shards, cap) + values.shape[1:], fill,
                   dtype=values.dtype)
    o = jnp.where(info.ok, info.owner, n_shards)
    return buf.at[o, info.rank].set(values, mode="drop")


def route(payload: Dict[str, jnp.ndarray], owner, mask, n_shards: int,
          cap: int, axis: str = AXIS
          ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, RouteInfo]:
    """Send each item's payload to its owner shard.

    Returns (received payload dict flattened to [n_shards*cap], received
    mask, RouteInfo for route_back). Must run inside shard_map over
    `axis`.
    """
    info = bucketize(owner, mask, n_shards, cap)
    out = {}
    for name, v in payload.items():
        buf = _to_buckets(v, info, n_shards, cap, 0)
        r = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                               tiled=False)
        out[name] = r.reshape((n_shards * cap,) + v.shape[1:])
    vbuf = _to_buckets(jnp.asarray(mask, jnp.int8), info, n_shards, cap, 0)
    rv = jax.lax.all_to_all(vbuf, axis, split_axis=0, concat_axis=0,
                            tiled=False)
    return out, rv.reshape(n_shards * cap) > 0, info


def route_back(answers: jnp.ndarray, info: RouteInfo, n_shards: int,
               cap: int, axis: str = AXIS, fill=0) -> jnp.ndarray:
    """Return per-received-item answers to the shards that asked.

    answers: [n_shards*cap, ...] aligned with route()'s received layout.
    Returns [n_items, ...] aligned with the original items (fill where an
    item was never sent).
    """
    buf = answers.reshape((n_shards, cap) + answers.shape[1:])
    back = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    o = jnp.where(info.ok, info.owner, n_shards)
    got = back.at[o, info.rank].get(mode="fill", fill_value=fill)
    return got
