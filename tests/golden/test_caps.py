"""Mid-path sink/cap semantics (SURVEY.md §3.2, §A.4; VERDICT r1 #6).

Two behaviors pinned here:
  1. dist under-estimation must NOT over-trim: a junction's dist bound
     only sees reads that touched the junction; reads that extend the
     path WITHOUT touching it leave caps that the walk keeps.
  2. a Bloom-FP tail (solid continuation never seen in any read) is
     still trimmed — back to the deepest cap, the real coverage depth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu.config import Config
from faucet_tpu.core import bloom as BL
from faucet_tpu.core.kmer import revcomp_seq
from faucet_tpu.pipeline import Pipeline
from refimpl.numpy_exact import ExactAssembler

K = 21


def _mk_case(rng):
    """Branch point -> linear path B; junction-touching reads reach only
    50 into B, deeper coverage comes from reads that never touch the
    junction; nothing covers past B[:120]."""
    bases = np.array(list("ACGT"))
    seq = lambda n: "".join(rng.choice(bases, size=n))
    A = seq(40)
    A2 = seq(40)
    B = seq(120)
    while A[-1] == A2[-1]:  # distinct last base => left branch
        A2 = A2[:-1] + str(rng.choice(bases))
    r_junc1 = A[-30:] + B[:50]
    r_junc2 = A2[-30:] + B[:50]
    r_deep = B[30:120]
    reads = [r_junc1, r_junc1, r_junc2, r_junc2, r_deep, r_deep]
    return A, A2, B, reads


def test_caps_prevent_over_trim(rng):
    A, A2, B, reads = _mk_case(rng)
    ex = ExactAssembler(K)
    g_ref = ex.assemble(reads)

    cfg = Config(size_kmer=K, max_read_length=100, batch_reads=16,
                 exact=True, estimated_kmers=1 << 12, singletons=1 << 12,
                 junction_capacity=1 << 10, sink_capacity=1 << 12)
    p = Pipeline(cfg)
    p.load_reads(reads)
    p.scan_reads(reads)
    g_dev = p.build()

    keys_ref = sorted(g_ref.contigs[i].canonical_seq()
                      for i in g_ref.live())
    keys_dev = sorted(g_dev.contigs[i].canonical_seq()
                      for i in g_dev.live())
    assert keys_dev == keys_ref
    # the full B extent must appear in ONE contig: a walk from the
    # junction that keeps going to the deepest cap (B[:120] end), not a
    # dist-trimmed 50-deep stub plus an overlapping pass-2 duplicate
    deepest = B[:120]
    hits = [k for k in keys_dev
            if deepest in k or revcomp_seq(deepest) in k]
    assert len(hits) == 1, (len(hits), [len(k) for k in keys_dev])
    stubs = [k for k in keys_dev
             if (B[:45] in k or revcomp_seq(B[:45]) in k)
             and deepest not in k and revcomp_seq(deepest) not in k]
    assert not stubs, [len(s) for s in stubs]


def test_fp_tail_still_trimmed(rng):
    """Planted 'false positive' solid chain beyond real coverage: the
    walk overshoots into it and must be trimmed back to the deepest
    cap (= real coverage end), not emitted."""
    A, A2, B, reads = _mk_case(rng)
    cfg = Config(size_kmer=K, max_read_length=100, batch_reads=16,
                 exact=True, estimated_kmers=1 << 12, singletons=1 << 12,
                 junction_capacity=1 << 10, sink_capacity=1 << 12)
    p = Pipeline(cfg)
    p.load_reads(reads)
    # plant a solid continuation beyond B[:120] directly in the
    # membership state (NO reads see it => no caps, like a Bloom FP
    # chain): k-mers of B[100:120] + C
    bases = np.array(list("ACGT"))
    C = "".join(rng.choice(bases, size=40))
    tail = B[120 - (K - 1):120] + C
    from faucet_tpu.core.kmer import encode_kmer

    his, los = [], []
    for i in range(len(tail) - K + 1):
        w = tail[i : i + K]
        c = min(w, revcomp_seq(w))
        hi, lo = encode_kmer(c)
        his.append(hi)
        los.append(lo)
    khi = jnp.asarray(np.array(his + his, np.uint32))
    klo = jnp.asarray(np.array(los + los, np.uint32))
    mask = jnp.ones((len(his) * 2,), bool)
    p.cascade = BL.cascade_insert(p.cascade, khi, klo, mask, cfg)
    p.scan_reads(reads)
    g = p.build()
    for i in g.live():
        s = g.contigs[i].seq
        assert C[:K] not in s and revcomp_seq(C[:K]) not in s, \
            "FP tail survived the cap trim"
    # real extent still present in full
    keys = sorted(g.contigs[i].canonical_seq() for i in g.live())
    assert any(B[:120] in k or revcomp_seq(B[:120]) in k for k in keys)
