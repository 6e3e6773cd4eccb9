"""Checkpoint / resume of the post-scan stream state.

Reference analogue: Bloom B and the junction map serialize after the scan
phase and reload via -bloom_file / -junctions_file, skipping both stream
passes (SURVEY.md §3.3, §5 "Checkpoint / resume" [C:high] — a required
capability, not an optimization). Same contract here: two npz files (the
membership state and the junction+sink tables) stamped with a config hash
so a resume against different parameters fails loudly instead of
corrupting the graph phase.
"""
from __future__ import annotations

import hashlib
import json

import numpy as np
import jax.numpy as jnp

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core import table as T


def _cfg_hash(cfg: Config) -> str:
    # only semantics-affecting fields guard the checkpoint. The RESOLVED
    # junction mode and the effective per-filter hash counts are part of
    # the contract: a filter probed with a different hash count than it
    # was written with silently changes the effective fp rate, and a
    # nodes-mode resume against a checkpoint without a node cascade
    # would detect zero junctions (ADVICE r1 high/low).
    keys = ("size_kmer", "estimated_kmers", "singletons", "fp_rate",
            "two_hash", "exact", "n_shards")
    d = {k: getattr(cfg, k) for k in keys}
    d["use_node_junctions"] = cfg.use_node_junctions
    d["n_hash"] = (cfg.n_hash_a, cfg.n_hash_b)
    if cfg.use_node_junctions:
        d["n_hash_nodes"] = (cfg.n_hash_d, cfg.n_hash_e)
    return hashlib.sha256(json.dumps(d, sort_keys=True).encode()).hexdigest()


def _table_arrays(prefix: str, tbl: T.Table):
    out = {f"{prefix}_keys_hi": np.asarray(tbl.keys_hi),
           f"{prefix}_keys_lo": np.asarray(tbl.keys_lo),
           f"{prefix}_count": np.asarray(tbl.count),
           f"{prefix}_dropped": np.asarray(tbl.dropped)}
    for i, v in enumerate(tbl.vals):
        out[f"{prefix}_val{i}"] = np.asarray(v)
    return out


def _table_from(prefix: str, z) -> T.Table:
    n_vals = 0
    while f"{prefix}_val{n_vals}" in z:
        n_vals += 1
    return T.Table(
        keys_hi=jnp.asarray(z[f"{prefix}_keys_hi"]),
        keys_lo=jnp.asarray(z[f"{prefix}_keys_lo"]),
        vals=tuple(jnp.asarray(z[f"{prefix}_val{i}"])
                   for i in range(n_vals)),
        count=jnp.asarray(z[f"{prefix}_count"]),
        dropped=jnp.asarray(z[f"{prefix}_dropped"]))


def save_bloom(path: str, cfg: Config, cascade: BL.Cascade,
               node_cascade: BL.Cascade = None):
    extra = {}
    if node_cascade is not None:
        extra = dict(nd_words=np.asarray(node_cascade.a_bloom.words),
                     ne_words=np.asarray(node_cascade.b_bloom.words),
                     **_table_arrays("ndt", node_cascade.a_table),
                     **_table_arrays("net", node_cascade.b_table))
    np.savez_compressed(
        path, cfg_hash=np.frombuffer(_cfg_hash(cfg).encode(), np.uint8),
        a_words=np.asarray(cascade.a_bloom.words),
        b_words=np.asarray(cascade.b_bloom.words),
        **_table_arrays("at", cascade.a_table),
        **_table_arrays("bt", cascade.b_table), **extra)


def load_bloom(path: str, cfg: Config):
    """Returns (cascade, node_cascade-or-None)."""
    z = np.load(path)
    _check(z, cfg, path)
    cascade = BL.Cascade(
        a_bloom=BL.Bloom(jnp.asarray(z["a_words"])),
        b_bloom=BL.Bloom(jnp.asarray(z["b_words"])),
        a_table=_table_from("at", z),
        b_table=_table_from("bt", z))
    node_cascade = None
    if "nd_words" in z:
        node_cascade = BL.Cascade(
            a_bloom=BL.Bloom(jnp.asarray(z["nd_words"])),
            b_bloom=BL.Bloom(jnp.asarray(z["ne_words"])),
            a_table=_table_from("ndt", z),
            b_table=_table_from("net", z))
    elif cfg.use_node_junctions:
        # a nodes-mode scan against an empty node cascade would detect
        # ZERO junctions and silently emit wrong contigs (ADVICE r1 high)
        raise ValueError(
            f"checkpoint {path} has no branch-node cascade but this run "
            "resolves junction_detect=nodes; re-run with "
            "--junction_detect ext8 or rebuild the checkpoint")
    return cascade, node_cascade


def save_junctions(path: str, cfg: Config, junctions: T.Table,
                   sinks: T.Table, pairs: T.Table = None):
    extra = _table_arrays("p", pairs) if pairs is not None else {}
    np.savez_compressed(
        path, cfg_hash=np.frombuffer(_cfg_hash(cfg).encode(), np.uint8),
        **_table_arrays("j", junctions), **_table_arrays("s", sinks),
        **extra)


def load_junctions(path: str, cfg: Config):
    """Returns (junctions, sinks, pairs-or-None). The pair table rides
    in the junction checkpoint so a paired-end resume keeps its
    disentangle evidence (VERDICT r1 weak #11)."""
    z = np.load(path)
    _check(z, cfg, path)
    pairs = _table_from("p", z) if "p_keys_hi" in z else None
    return _table_from("j", z), _table_from("s", z), pairs


def _check(z, cfg: Config, path: str):
    want = _cfg_hash(cfg)
    got = bytes(z["cfg_hash"]).decode()
    if got != want:
        raise ValueError(
            f"checkpoint {path} was written with different k-mer/filter "
            f"parameters (hash {got[:12]} != {want[:12]}); refusing to "
            "resume")
