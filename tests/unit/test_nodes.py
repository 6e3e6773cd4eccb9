"""Tagged-node junction detection == 8-way extension probing (exact sets).

The claim core/nodes.py rests on: over an exact solid set S,
  ">=2 of window w's right (left) slot-extensions are in S"
is equivalent to
  ">=2 distinct edges of S carry endpoint key == w's right (left) probe
   key",
except at palindromic (k-1)-nodes where the node formulation may only
over-detect (side bit folded). k=5 makes random sequence branchy (4^5 <<
genome length) and palindromic 4-mers common, exercising both cases.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu.core import kmer as KM
from faucet_tpu.core import nodes as ND
from faucet_tpu.core import u32x2 as u2


def _as_int(hi, lo):
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(
        lo, np.uint64)


@pytest.mark.parametrize("k,glen", [(5, 3000), (7, 4000), (11, 20000)])
def test_node_keys_equiv_ext8(rng, k, glen):
    genome = rng.integers(0, 4, size=glen, dtype=np.uint8)
    bases = jnp.asarray(genome[None, :])
    lens = jnp.asarray(np.array([glen], np.int32))
    v = KM.kmerize(bases, lens, k)
    other_hi, other_lo = u2.select(v.canon_is_fwd, v.rc_hi, v.rc_lo,
                                   v.fwd_hi, v.fwd_lo)
    valid = np.asarray(v.valid[0])
    chi = np.asarray(v.canon_hi[0])[valid]
    clo = np.asarray(v.canon_lo[0])[valid]
    ohi = np.asarray(other_hi[0])[valid]
    olo = np.asarray(other_lo[0])[valid]
    codes = _as_int(chi, clo)

    # distinct edges with their frames (first occurrence per code)
    _, first = np.unique(codes, return_index=True)
    dchi, dclo, dohi, dolo = (chi[first], clo[first], ohi[first],
                              olo[first])

    # node formulation: endpoint-key counts over distinct edges
    pk_hi, pk_lo, sk_hi, sk_lo = ND.endpoint_keys(
        jnp.asarray(dchi), jnp.asarray(dclo), jnp.asarray(dohi),
        jnp.asarray(dolo), k)
    epk = np.concatenate([_as_int(pk_hi, pk_lo), _as_int(sk_hi, sk_lo)])
    keys, counts = np.unique(epk, return_counts=True)
    E2 = keys[counts >= 2]  # uint64; keep dtype (isin vs list would
    # upcast through float64 and lose the side-tag bit at 2^62)

    rk_hi, rk_lo, lk_hi, lk_lo = ND.probe_keys(
        jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(ohi),
        jnp.asarray(olo), k)
    isj_nodes = (np.isin(_as_int(rk_hi, rk_lo), E2) |
                 np.isin(_as_int(lk_hi, lk_lo), E2))

    # ext8 formulation
    ehi, elo = KM.slot_ext_pairs(jnp.asarray(chi), jnp.asarray(clo),
                                 jnp.asarray(ohi), jnp.asarray(olo), k)
    ext_in = np.isin(_as_int(np.asarray(ehi), np.asarray(elo)),
                     np.unique(codes)).reshape(-1, 8)
    isj_ext8 = (ext_in[:, :4].sum(1) >= 2) | (ext_in[:, 4:].sum(1) >= 2)

    # palindromic-node windows may over-detect; all others must agree
    def pal_mask(fhi, flo, rhi, rlo):
        return np.asarray(fhi) == np.asarray(rhi), None

    p_fwd, p_rc, s_fwd, s_rc = ND._node_views(
        jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(ohi),
        jnp.asarray(olo), k)
    pal = (np.asarray(u2.eq(*p_fwd, *p_rc)) |
           np.asarray(u2.eq(*s_fwd, *s_rc)))

    np.testing.assert_array_equal(isj_nodes[~pal], isj_ext8[~pal])
    # over-detection only, never a miss
    assert not np.any(isj_ext8 & ~isj_nodes)
    # sanity: random sequence at small k must actually branch
    assert isj_ext8.sum() > 10
