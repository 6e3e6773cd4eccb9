"""Tests for the device open-addressing table (SURVEY.md §4: junction-table
insert/merge semantics), differentially against a python dict."""
import numpy as np
import jax.numpy as jnp

from faucet_tpu.core import table as T


def _rand_keys(rng, n, space=200):
    # small key space to force duplicates within and across batches
    hi = rng.integers(0, 4, size=n).astype(np.uint32)
    lo = rng.integers(0, space, size=n).astype(np.uint32)
    return hi, lo


def test_upsert_lookup_matches_dict(rng):
    cap = 1 << 10
    tbl = T.make(cap, val_specs=(((8,), jnp.int32), ((8,), jnp.uint16)))
    model = {}
    for _ in range(5):
        n = 512
        hi, lo = _rand_keys(rng, n)
        cov = rng.integers(0, 3, size=(n, 8)).astype(np.int32)
        dist = rng.integers(0, 100, size=(n, 8)).astype(np.uint16)
        mask = rng.random(n) < 0.9
        tbl = T.upsert(tbl, jnp.asarray(hi), jnp.asarray(lo),
                       (jnp.asarray(cov), jnp.asarray(dist)),
                       jnp.asarray(mask), modes=("add", "max"))
        for i in range(n):
            if not mask[i]:
                continue
            key = (int(hi[i]), int(lo[i]))
            c, d = model.get(key, (np.zeros(8, np.int64),
                                   np.zeros(8, np.int64)))
            model[key] = (c + cov[i], np.maximum(d, dist[i]))

    assert int(tbl.dropped) == 0
    assert int(tbl.count) == len(model)

    keys = list(model.keys())
    qhi = jnp.asarray(np.array([k[0] for k in keys], np.uint32))
    qlo = jnp.asarray(np.array([k[1] for k in keys], np.uint32))
    found, idx = T.lookup(tbl, qhi, qlo, jnp.ones(len(keys), bool))
    assert bool(jnp.all(found))
    cov_t = np.asarray(tbl.vals[0])[np.asarray(idx)]
    dist_t = np.asarray(tbl.vals[1])[np.asarray(idx)]
    for j, k in enumerate(keys):
        np.testing.assert_array_equal(cov_t[j], model[k][0])
        np.testing.assert_array_equal(dist_t[j], model[k][1])

    # absent keys not found
    qhi = jnp.asarray(np.full(16, 7, np.uint32))  # hi=7 never inserted
    qlo = jnp.asarray(np.arange(16, dtype=np.uint32))
    found, _ = T.lookup(tbl, qhi, qlo, jnp.ones(16, bool))
    assert not bool(jnp.any(found))


def test_upsert_masked_lanes_ignored(rng):
    tbl = T.make(1 << 8, val_specs=(((), jnp.int32),))
    hi = jnp.zeros(32, jnp.uint32)
    lo = jnp.arange(32, dtype=jnp.uint32)
    v = jnp.ones(32, jnp.int32)
    tbl = T.upsert(tbl, hi, lo, (v,), jnp.zeros(32, bool), modes=("add",))
    assert int(tbl.count) == 0
    assert not bool(jnp.any(T.occupied_mask(tbl)))


def test_upsert_high_load_and_overflow(rng):
    # fill a tiny table beyond capacity: must count drops, not corrupt
    cap = 64
    tbl = T.make(cap, val_specs=(((), jnp.int32),))
    hi = jnp.zeros(256, jnp.uint32)
    lo = jnp.arange(256, dtype=jnp.uint32)
    v = jnp.ones(256, jnp.int32)
    tbl = T.upsert(tbl, hi, lo, (v,), jnp.ones(256, bool), modes=("add",))
    assert int(tbl.count) <= cap
    assert int(tbl.count) + int(tbl.dropped) == 256
    # every occupied slot holds a unique key with value 1
    occ = np.asarray(T.occupied_mask(tbl))
    np.testing.assert_array_equal(np.asarray(tbl.vals[0])[occ], 1)


def test_exact_set_semantics(rng):
    # keys-only table as exact membership set
    tbl = T.make(1 << 9)
    hi, lo = _rand_keys(rng, 200, space=1000)
    tbl = T.upsert(tbl, jnp.asarray(hi), jnp.asarray(lo), (),
                   jnp.ones(200, bool), modes=())
    inserted = {(int(a), int(b)) for a, b in zip(hi, lo)}
    assert int(tbl.count) == len(inserted)
    qhi, qlo = _rand_keys(rng, 500, space=1000)
    got = np.asarray(T.contains(tbl, jnp.asarray(qhi), jnp.asarray(qlo),
                                jnp.ones(500, bool)))
    want = np.array([(int(a), int(b)) in inserted for a, b in zip(qhi, qlo)])
    np.testing.assert_array_equal(got, want)
