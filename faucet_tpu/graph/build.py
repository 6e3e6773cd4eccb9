"""Phase-3 graph build: device walks -> host ContigGraph.

Reference analogue: ContigGraph::buildGraph driving BF walks from every
covered junction slot (ref:src/ContigGraph.cpp, SURVEY.md §3.1 PHASE 3
[C:high]). TPU re-design: all walks run as one lockstep device frontier
(graph/walk.py); the host only decodes the resulting base strips and
assembles Contig records. Pass 2 rebuilds junction-free components from
sink anchors in chunks, filtering later sinks through the k-mers already
visited (SURVEY.md §A.6 and refimpl/numpy_exact.py build()).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from faucet_tpu.core import bloom as BL
from faucet_tpu.core import kmer as KM
from faucet_tpu.core import table as T
from faucet_tpu.core.kmer import decode_kmer, revcomp_code_np, revcomp_seq
from faucet_tpu.graph import walk as W
from faucet_tpu.graph.model import Contig, ContigGraph, End

_CODEBOOK = "ACGT"


def _to_int(hi, lo):
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(
        lo, np.uint64)


def extract_table(tbl: T.Table):
    """Occupied rows of a device table -> host numpy dict."""
    keys_hi = np.asarray(tbl.keys_hi)
    occ = keys_hi != np.uint32(0xFFFFFFFF)
    out = {
        "hi": keys_hi[occ],
        "lo": np.asarray(tbl.keys_lo)[occ],
    }
    for i, v in enumerate(tbl.vals):
        out[f"v{i}"] = np.asarray(v)[occ]
    return out


def _pad_pow2(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class GraphBuilder:
    def __init__(self, cfg, cascade: BL.Cascade, junctions: T.Table,
                 sinks: T.Table):
        self.cfg = cfg
        self.cascade = cascade
        self.junctions = junctions
        self.sinks = sinks
        self._walk_round = jax.jit(
            W.walk_round, static_argnames=("n_steps", "cfg"))

    # ---- device walk driver --------------------------------------------
    def _run_walks(self, chi, clo, dirs, forced, circle_ok):
        """Drive walks to completion in rounds; returns host dict."""
        cfg = self.cfg
        n = len(chi)
        assert n > 0
        Wp = _pad_pow2(n)
        k = cfg.size_kmer

        def pad(a, fill):
            out = np.full((Wp,), fill, dtype=np.asarray(a).dtype)
            out[:n] = a
            return out

        chi_p = pad(np.asarray(chi, np.uint32), 0)
        clo_p = pad(np.asarray(clo, np.uint32), 0)
        rc = revcomp_code_np(_to_int(chi_p, clo_p), k)
        active = np.zeros(Wp, bool)
        active[:n] = True
        fr = W.make_frontier(
            jnp.asarray(chi_p), jnp.asarray(clo_p),
            jnp.asarray((rc >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((rc & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray(pad(np.asarray(dirs, np.int32), 0)),
            jnp.asarray(pad(np.asarray(forced, np.int32), -1)),
            jnp.asarray(active),
            jnp.asarray(pad(np.asarray(circle_ok, bool), False)))
        strips: List[np.ndarray] = []
        total = 0
        while total < cfg.max_contig_len:
            fr, bases = self._walk_round(
                self.cascade, self.junctions, fr,
                n_steps=cfg.walk_round_steps, cfg=cfg)
            strips.append(np.asarray(bases))
            total += cfg.walk_round_steps
            if not bool(jnp.any(fr.active)):
                break
        allb = np.concatenate(strips, axis=1) if strips else np.zeros(
            (Wp, 0), np.uint8)
        chi_f, clo_f, cisf = KM.canon_of(fr.fhi, fr.flo, fr.rhi, fr.rlo)
        return {
            "bases": allb[:n],
            "end_kind": np.asarray(fr.end_kind)[:n],
            "entry_slot": np.asarray(fr.entry_slot)[:n],
            "steps": np.asarray(fr.steps)[:n],
            "end_hi": np.asarray(chi_f)[:n],
            "end_lo": np.asarray(clo_f)[:n],
        }

    # ---- contig assembly -------------------------------------------------
    def _strip_to_str(self, row: np.ndarray, steps: int) -> str:
        return "".join(_CODEBOOK[b] for b in row[:steps] if b != 255)

    def build(self) -> ContigGraph:
        cfg = self.cfg
        k = cfg.size_kmer
        jt = extract_table(self.junctions)
        cov8 = jt.get("v0", np.zeros((0, 8), np.int32))
        dist8 = jt.get("v1", np.zeros((0, 8), np.uint16))
        jkeys = _to_int(jt["hi"], jt["lo"])
        order = np.argsort(jkeys, kind="stable")
        jkeys, cov8, dist8 = jkeys[order], cov8[order], dist8[order]
        jhi, jlo = jt["hi"][order], jt["lo"][order]
        jcov_by_key: Dict[int, np.ndarray] = {
            int(kk): cov8[i] for i, kk in enumerate(jkeys)}

        by_key: Dict[str, Contig] = {}

        # ---- pass 1: walks from every covered junction slot -------------
        rows, slots = np.nonzero(cov8 > 0)
        if len(rows):
            dirs = (slots >= 4).astype(np.int32)
            forced = np.where(slots < 4, slots, 3 - (slots - 4)).astype(
                np.int32)
            out = self._run_walks(jhi[rows], jlo[rows], dirs, forced,
                                  np.zeros(len(rows), bool))
            for i in range(len(rows)):
                c = self._pass1_contig(
                    jhi[rows[i]], jlo[rows[i]], int(slots[i]),
                    cov8[rows[i]], dist8[rows[i]], out, i, jcov_by_key)
                if c is not None:
                    by_key.setdefault(c.canonical_seq(), c)

        visited = set()
        for c in by_key.values():
            src = c.seq + (c.seq[: k - 1] if c.circular else "")
            for i in range(len(src) - k + 1):
                w = src[i : i + k]
                visited.add(min(w, revcomp_seq(w)))

        # ---- pass 2: junction-free components from sink anchors ---------
        st = extract_table(self.sinks)
        skeys = _to_int(st["hi"], st["lo"])
        order = np.argsort(skeys, kind="stable")
        shi, slo = st["hi"][order], st["lo"][order]
        scov = st["v0"][order]
        jset = set(int(x) for x in jkeys)
        chunk = 4096
        pend = [i for i in range(len(shi))
                if int(_to_int(shi[i], slo[i])) not in jset]
        while pend:
            batch = []
            for i in pend:
                s = decode_kmer(int(shi[i]), int(slo[i]), k)
                if s not in visited:  # s is canonical already
                    batch.append(i)
                if len(batch) >= chunk:
                    break
            if not batch:
                break
            pend = [i for i in pend if i not in set(batch)]
            new = self._pass2_contigs(shi[batch], slo[batch], scov[batch])
            for c in new:
                key = c.canonical_seq()
                if key in by_key:
                    continue
                by_key[key] = c
                src = c.seq + (c.seq[: k - 1] if c.circular else "")
                for i in range(len(src) - k + 1):
                    w = src[i : i + k]
                    visited.add(min(w, revcomp_seq(w)))

        return ContigGraph(k, list(by_key.values()))

    def _pass1_contig(self, hi, lo, slot, cov8, dist8, out, i,
                      jcov_by_key) -> Optional[Contig]:
        cfg = self.cfg
        k = cfg.size_kmer
        node = decode_kmer(int(hi), int(lo), k)
        w0 = node if slot < 4 else revcomp_seq(node)
        steps = int(out["steps"][i])
        kind = int(out["end_kind"][i])
        bases = self._strip_to_str(out["bases"][i], steps)
        seq = w0 + bases
        dist = int(dist8[slot])
        if kind in (W.END_DEAD, W.END_AMBIG, W.RUNNING):
            if dist and steps > dist:
                seq = seq[: k + dist]  # trim FP tail to observed coverage
            cov = float(cov8[slot])
            return Contig(seq=seq, cov=cov, left=End(node, slot), right=None)
        if kind == W.END_JUNCTION:
            end_key = int(_to_int(out["end_hi"][i], out["end_lo"][i]))
            end_node = decode_kmer(int(out["end_hi"][i]),
                                   int(out["end_lo"][i]), k)
            eslot = int(out["entry_slot"][i])
            ecov = jcov_by_key.get(end_key)
            cov = (float(cov8[slot]) + (float(ecov[eslot])
                                        if ecov is not None else 0.0)) / 2
            return Contig(seq=seq, cov=cov, left=End(node, slot),
                          right=End(end_node, eslot))
        # circular cannot happen for junction-seeded walks (circle_ok=False)
        return None

    def _pass2_contigs(self, shi, slo, scov) -> List[Contig]:
        cfg = self.cfg
        k = cfg.size_kmer
        n = len(shi)
        zeros = np.zeros(n, np.int32)
        rout = self._run_walks(shi, slo, zeros, zeros - 1,
                               np.ones(n, bool))
        lout = self._run_walks(shi, slo, zeros + 1, zeros - 1,
                               np.ones(n, bool))
        contigs = []
        for i in range(n):
            start = decode_kmer(int(shi[i]), int(slo[i]), k)
            cov = float(scov[i])
            rsteps = int(rout["steps"][i])
            rb = self._strip_to_str(rout["bases"][i], rsteps)
            if int(rout["end_kind"][i]) == W.END_CIRCULAR:
                contigs.append(Contig(seq=(start + rb)[:rsteps], cov=cov,
                                      circular=True))
                continue
            lsteps = int(lout["steps"][i])
            lb = self._strip_to_str(lout["bases"][i], lsteps)
            seq = revcomp_seq(revcomp_seq(start) + lb) + rb
            left = None
            if int(lout["end_kind"][i]) == W.END_JUNCTION:
                ln = decode_kmer(int(lout["end_hi"][i]),
                                 int(lout["end_lo"][i]), k)
                left = End(ln, int(lout["entry_slot"][i]))
            right = None
            if int(rout["end_kind"][i]) == W.END_JUNCTION:
                rn = decode_kmer(int(rout["end_hi"][i]),
                                 int(rout["end_lo"][i]), k)
                right = End(rn, int(rout["entry_slot"][i]))
            contigs.append(Contig(seq=seq, cov=cov, left=left, right=right))
        return contigs
