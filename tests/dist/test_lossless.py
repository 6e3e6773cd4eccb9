"""Lossless routing + scan-update rounds under adversarial skew
(SURVEY.md §7.3 hard-part #1 "without silent drops"; VERDICT r1 #3).

Worst cases that used to drop data silently:
  - every k-mer owned by ONE shard (hash-range skew beyond any static
    capacity factor) -> route_consume/route_query must carry overflow
    to extra all-to-all rounds;
  - junction/sink updates beyond cfg.scan_update_cap in one batch ->
    upsert_rounds must take more rounds, not drop lanes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P
from jax import shard_map

from faucet_tpu import simulate
from faucet_tpu.config import Config
from faucet_tpu.core import scan as SC
from faucet_tpu.core import table as T
from faucet_tpu.dist import route as R
from faucet_tpu.dist.mesh import AXIS, make_mesh
from faucet_tpu.dist.sharded import ShardedPipeline
from faucet_tpu.pipeline import Pipeline

S = 8
N = 512
CAP = 96  # << N: all-to-one skew needs ceil(512/96) = 6 rounds


def _local_consume(vals, owner):
    def consume(st, recv, rmask):
        cnt, tot = st
        return (cnt + jnp.sum(rmask, dtype=jnp.int32),
                tot + jnp.sum(jnp.where(rmask, recv["v"], 0),
                              dtype=jnp.uint32))

    (cnt, tot), unsent = R.route_consume(
        {"v": vals}, owner, jnp.ones((N,), bool), S, CAP, consume,
        (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.uint32)))
    return cnt.reshape(1), tot.reshape(1), unsent.reshape(1)


def test_route_consume_all_to_one_shard():
    mesh = make_mesh(S)
    vals = jnp.arange(S * N, dtype=jnp.uint32)
    owner = jnp.full((S * N,), 3, jnp.int32)
    f = jax.jit(shard_map(_local_consume, mesh=mesh,
                          in_specs=(P(AXIS), P(AXIS)),
                          out_specs=(P(AXIS), P(AXIS), P(AXIS)),
                          check_vma=False))
    cnt, tot, unsent = f(vals, owner)
    cnt, tot, unsent = map(np.asarray, (cnt, tot, unsent))
    assert unsent.sum() == 0
    # every item landed, all at shard 3
    assert cnt.sum() == S * N
    assert cnt[3] == S * N and (np.delete(cnt, 3) == 0).all()
    assert tot[3] == np.arange(S * N, dtype=np.uint64).sum() % (1 << 32)


def _local_query(vals, owner):
    got, unsent = R.route_query(
        {"v": vals}, owner, jnp.ones((N,), bool), S, CAP,
        lambda recv, rmask: jnp.where(
            rmask, recv["v"] * jnp.uint32(3) + jnp.uint32(1), 0),
        ans_dtype=jnp.uint32)
    return got, unsent.reshape(1)


def test_route_query_all_to_one_shard():
    mesh = make_mesh(S)
    vals = jnp.arange(S * N, dtype=jnp.uint32)
    owner = jnp.full((S * N,), 5, jnp.int32)
    f = jax.jit(shard_map(_local_query, mesh=mesh,
                          in_specs=(P(AXIS), P(AXIS)),
                          out_specs=(P(AXIS), P(AXIS)),
                          check_vma=False))
    got, unsent = f(vals, owner)
    assert np.asarray(unsent).sum() == 0
    np.testing.assert_array_equal(
        np.asarray(got), np.arange(S * N, dtype=np.uint32) * 3 + 1)


def _table_content(tbl):
    """Canonical key->values map (slot placement is insert-order-
    sensitive under open-addressing collisions; CONTENT is the
    invariant every consumer depends on)."""
    hi = np.asarray(tbl.keys_hi)
    lo = np.asarray(tbl.keys_lo)
    occ = hi != np.uint32(0xFFFFFFFF)
    out = {}
    for i in np.nonzero(occ)[0]:
        out[(int(hi[i]), int(lo[i]))] = tuple(
            np.asarray(v[i]).tolist() for v in tbl.vals)
    return out


def test_scan_update_cap_rounds_lossless():
    """A tiny scan_update_cap must change NOTHING: more rounds, same
    table CONTENT (the old code dropped the overflow lanes forever)."""
    rng = np.random.default_rng(99)
    genome = simulate.genome_with_repeats(rng, 2000, n_repeats=4,
                                          repeat_len=120)
    reads = simulate.shred(rng, genome, coverage=30, read_len=100)
    base = dict(size_kmer=21, max_read_length=100, batch_reads=128,
                exact=True, estimated_kmers=1 << 13, singletons=1 << 13,
                junction_capacity=1 << 12, sink_capacity=1 << 13)
    out = []
    for cap in (64, 1 << 13):
        p = Pipeline(Config(scan_update_cap=cap, **base))
        p.load_reads(reads)
        p.scan_reads(reads)
        out.append(p)
    a, b = out
    assert _table_content(a.junctions) == _table_content(b.junctions)
    assert _table_content(a.sinks) == _table_content(b.sinks)
    assert int(a.sinks.dropped.sum()) == 0
    assert len(_table_content(a.junctions)) > 0


def test_sharded_tiny_caps_bit_identical(monkeypatch):
    """Starve every routing buffer (capacity factor 0.25x the mean) so
    EVERY batch takes multiple all-to-all rounds; the sharded pipeline
    must still match the single-device tables bit for bit."""
    from faucet_tpu.dist import sharded as SH

    monkeypatch.setattr(
        SH, "_cap_for",
        lambda n, n_shards, factor=2.0: max(32, n // n_shards // 4))
    rng = np.random.default_rng(7)
    genome = simulate.genome_with_repeats(rng, 1500, n_repeats=2,
                                          repeat_len=100)
    reads = simulate.shred(rng, genome, coverage=25, read_len=100,
                           circular=True)
    cfg = Config(size_kmer=21, max_read_length=100, batch_reads=64,
                 exact=True, n_shards=S, estimated_kmers=1 << 13,
                 singletons=1 << 13, junction_capacity=1 << 12,
                 sink_capacity=1 << 13, scan_update_cap=128)
    sp = ShardedPipeline(cfg, make_mesh(S))
    sp.load_reads(reads)
    sp.scan_reads(reads)
    assert sp.metrics.counters.get("route_dropped", 0) == 0

    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)
    # round structure differs between the starved sharded run and the
    # single-device run, so compare canonical content, not slot layout
    assert _table_content(sp.cascade.b_table) == \
        _table_content(p.cascade.b_table)
    assert _table_content(sp.junctions) == _table_content(p.junctions)
    assert _table_content(sp.sinks) == _table_content(p.sinks)
    assert len(_table_content(sp.junctions)) > 0
