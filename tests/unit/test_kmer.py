"""Property tests for the k-mer codec (SURVEY.md §4: pack/unpack/revcomp
round-trip, canonical invariance, rolling vs recompute-from-scratch)."""
import numpy as np
import jax.numpy as jnp
import pytest

from faucet_tpu.core import kmer as K
from faucet_tpu.core import u32x2 as u2


def _random_seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


def test_encode_decode_roundtrip(rng):
    s = _random_seq(rng, 100, with_n=True)
    assert K.decode_seq(K.encode_seq(s)) == s.upper()


def test_revcomp_involution(rng):
    s = _random_seq(rng, 63)
    assert K.revcomp_seq(K.revcomp_seq(s)) == s
    # complement rule A<->T, C<->G
    assert K.revcomp_seq("ACGT") == "ACGT"
    assert K.revcomp_seq("AAAC") == "GTTT"


def test_encode_kmer_matches_decode(rng):
    for k in (5, 15, 17, 31):
        s = _random_seq(rng, k)
        hi, lo = K.encode_kmer(s)
        assert K.decode_kmer(hi, lo, k) == s


@pytest.mark.parametrize("k", [5, 15, 17, 31])
def test_kmerize_matches_scalar_recompute(rng, k):
    reads = [_random_seq(rng, int(n), with_n=True)
             for n in rng.integers(k - 2, 80, size=16)]
    L = 80
    bases, lens = K.pack_reads(reads, L)
    view = K.kmerize(jnp.asarray(bases), jnp.asarray(lens), k)
    fwd = np.asarray(u2.to_int(view.fwd_hi, view.fwd_lo))
    rc = np.asarray(u2.to_int(view.rc_hi, view.rc_lo))
    canon = np.asarray(u2.to_int(view.canon_hi, view.canon_lo))
    valid = np.asarray(view.valid)
    cisf = np.asarray(view.canon_is_fwd)

    for i, s in enumerate(reads):
        for p in range(L - k + 1):
            w = s[p : p + k]
            expect_valid = len(w) == k and all(c in "ACGT" for c in w)
            assert valid[i, p] == expect_valid, (i, p, w)
            if not expect_valid:
                continue
            fh, fl = K.encode_kmer(w)
            rh, rl = K.encode_kmer(K.revcomp_seq(w))
            f_int = (fh << 32) | fl
            r_int = (rh << 32) | rl
            assert fwd[i, p] == f_int
            assert rc[i, p] == r_int
            assert canon[i, p] == min(f_int, r_int)
            assert cisf[i, p] == (f_int <= r_int)


def test_canonical_invariance_under_revcomp(rng):
    k = 21
    s = _random_seq(rng, 50)
    bases, lens = K.pack_reads([s, K.revcomp_seq(s)], 50)
    view = K.kmerize(jnp.asarray(bases), jnp.asarray(lens), k)
    canon = np.asarray(u2.to_int(view.canon_hi, view.canon_lo))
    # canonical k-mer multiset of a read equals that of its revcomp
    a = sorted(canon[0][np.asarray(view.valid)[0]])
    b = sorted(canon[1][np.asarray(view.valid)[1]])
    assert a == b


@pytest.mark.parametrize("k", [7, 31])
def test_extensions_match_string_ops(rng, k):
    s = _random_seq(rng, k)
    fh, fl = K.encode_kmer(s)
    rh, rl = K.encode_kmer(K.revcomp_seq(s))
    args = tuple(jnp.asarray(np.uint32(x))[None] for x in (fh, fl, rh, rl))
    for b in range(4):
        efh, efl, erh, erl = K.right_ext(*args, np.uint32(b), k)
        w = s[1:] + "ACGT"[b]
        assert int(u2.to_int(efh, efl)[0]) == (
            (K.encode_kmer(w)[0] << 32) | K.encode_kmer(w)[1])
        wr = K.revcomp_seq(w)
        assert int(u2.to_int(erh, erl)[0]) == (
            (K.encode_kmer(wr)[0] << 32) | K.encode_kmer(wr)[1])
        efh, efl, erh, erl = K.left_ext(*args, np.uint32(b), k)
        w = "ACGT"[b] + s[:-1]
        assert int(u2.to_int(efh, efl)[0]) == (
            (K.encode_kmer(w)[0] << 32) | K.encode_kmer(w)[1])
        wr = K.revcomp_seq(w)
        assert int(u2.to_int(erh, erl)[0]) == (
            (K.encode_kmer(wr)[0] << 32) | K.encode_kmer(wr)[1])


def test_u32x2_shift_ops(rng):
    vals = rng.integers(0, 1 << 62, size=32, dtype=np.uint64)
    hi, lo = u2.from_int(vals)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    sh, sl = u2.shl2(hi, lo)
    np.testing.assert_array_equal(
        u2.to_int(sh, sl), (vals << np.uint64(2)) & np.uint64((1 << 64) - 1))
    sh, sl = u2.shr2(hi, lo)
    np.testing.assert_array_equal(u2.to_int(sh, sl), vals >> np.uint64(2))


def test_hashing_determinism_and_spread(rng):
    from faucet_tpu.core.hashing import hash_pair, bloom_positions

    hi = jnp.asarray(rng.integers(0, 1 << 30, size=4096), dtype=jnp.uint32)
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=4096), dtype=jnp.uint32)
    h1, h2 = hash_pair(hi, lo)
    h1b, _ = hash_pair(hi, lo)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h1b))
    assert np.all(np.asarray(h2) % 2 == 1)
    # positions roughly uniform over a small filter
    pos = np.asarray(bloom_positions(h1, h2, 4, 10)).ravel()
    counts = np.bincount(pos, minlength=1024)
    assert counts.max() < 60  # ~16 expected per bucket
