"""Junction-update spool (core/scan.JSpool) differential tests:
spooled scan + flush must produce the same junction-table CONTENTS as
per-batch direct upserts (layout may differ — round partitioning
changes slot-claim order — so compare key->value maps)."""
import numpy as np
import jax.numpy as jnp

import pytest

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core import scan as SC
from faucet_tpu.core import table as T
from faucet_tpu.core.kmer import pack_reads, revcomp_seq


def _cfg(**kw):
    base = dict(size_kmer=15, max_read_length=50, batch_reads=32,
                estimated_kmers=1 << 12, singletons=1 << 12,
                junction_capacity=1 << 10, sink_capacity=1 << 12)
    base.update(kw)
    return Config(**base)


def _table_map(tbl):
    hi = np.asarray(tbl.keys_hi)
    occ = hi != np.uint32(0xFFFFFFFF)
    lo = np.asarray(tbl.keys_lo)[occ]
    keys = (hi[occ].astype(np.uint64) << np.uint64(32)) | lo
    vals = [np.asarray(v)[occ] for v in tbl.vals]
    return {int(k): tuple(v[j].tolist() for v in vals)
            for j, k in enumerate(keys)}


def _reads(seed=3, n=96, L=50, glen=400):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    reads = []
    for _ in range(2):  # twice -> everything solid
        for _ in range(n // 2):
            s = rng.integers(0, glen - L)
            r = genome[s:s + L]
            if rng.random() < 0.5:
                r = revcomp_seq(r)
            # occasional error to force junctions
            if rng.random() < 0.5:
                p = rng.integers(0, L)
                r = r[:p] + "ACGT"[rng.integers(0, 4)] + r[p + 1:]
            reads.append(r)
    return reads


def _run(spool: bool, reads, cfg):
    cascade = BL.make_cascade(cfg)
    nodec = BL.make_cascade(cfg.node_view()) if cfg.use_node_junctions \
        else None
    jt = T.make(cfg.junction_cap, (((8,), jnp.int32), ((8,), jnp.uint16)))
    st = T.make(cfg.sink_cap, (((), jnp.int32),))
    js = SC.make_jspool(cfg) if spool else None
    B = cfg.batch_reads
    for i in range(0, len(reads), B):
        chunk = reads[i:i + B] + [""] * max(0, B - len(reads[i:i + B]))
        bases, lens = pack_reads(chunk, cfg.max_read_length)
        if nodec is not None:
            cascade, nodec, _n, ws = SC.load_batch_nodes_s(
                cascade, nodec, jnp.asarray(bases), jnp.asarray(lens),
                cfg)
        else:
            cascade, ws = SC.load_batch_s(cascade, jnp.asarray(bases),
                                          jnp.asarray(lens), cfg)
        res = SC.scan_batch(cascade, jt, st, jnp.asarray(bases),
                            jnp.asarray(lens), cfg, nodec,
                            window_solid=ws, jspool=js)
        jt, st, js = res.junctions, res.sinks, res.jspool
    if js is not None:
        jt, js = SC.spool_flush(jt, js, cfg)
        assert int(js.cnt) == 0
    return jt, st


def test_spool_matches_direct():
    cfg = _cfg()
    reads = _reads()
    jt_s, st_s = _run(True, reads, cfg)
    jt_d, st_d = _run(False, reads, cfg)
    assert _table_map(jt_s) == _table_map(jt_d)
    assert _table_map(st_s) == _table_map(st_d)  # sinks untouched


def test_spool_mid_stream_flush():
    # tiny spool capacity forces flushes during the stream, exercising
    # the flush-before-append cond path
    cfg = _cfg(batch_reads=16, scan_update_cap=64)
    reads = _reads(seed=9, n=512)  # enough batches to overflow the
    #   (B*P + K)-sized spool at least once mid-stream
    jt_s, _ = _run(True, reads, cfg)
    jt_d, _ = _run(False, reads, cfg)
    assert _table_map(jt_s) == _table_map(jt_d)


def test_pipeline_flush_at_phase_end():
    from faucet_tpu.pipeline import Pipeline

    cfg = _cfg()
    reads = _reads(seed=5)
    p = Pipeline(cfg)
    p.load_reads(iter(reads))
    p.scan_reads(iter(reads))
    assert p.jspool is not None and int(p.jspool.cnt) == 0
    # table contents must match a spool-disabled (direct-upsert) run
    # (ADVICE r4: the old `count >= 0` assert was vacuous)
    q = Pipeline(_cfg(spool_junctions=False))
    q.load_reads(iter(reads))
    q.scan_reads(iter(reads))
    assert q.jspool is None
    assert _table_map(p.junctions) == _table_map(q.junctions)
    assert int(p.junctions.count) == int(q.junctions.count) > 0
