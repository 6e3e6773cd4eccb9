"""Native C++ reader/packer vs the Python reference (SURVEY.md §7.1.5)."""
import numpy as np
import pytest

from faucet_tpu import simulate
from faucet_tpu.core.kmer import pack_reads
from faucet_tpu.io import native as NV
from faucet_tpu.io.fastq import read_seqs

pytestmark = pytest.mark.skipif(not NV.available(),
                                reason="native packer unavailable")


def _roundtrip(tmp_path, write_fn, fastq, reads, batch=32, maxlen=120):
    path = str(tmp_path / ("r.fq" if fastq else "r.fa"))
    write_fn(path, reads)
    got_b, got_l = [], []
    for bases, lens in NV.native_batch_iter(path, fastq, batch, maxlen):
        n = int((lens > 0).sum())
        got_b.append(bases[:n])
        got_l.append(lens[:n])
    gb = np.concatenate(got_b) if got_b else np.zeros((0, maxlen), np.uint8)
    gl = np.concatenate(got_l) if got_l else np.zeros((0,), np.int32)
    want_b, want_l = pack_reads(reads, maxlen)
    keep = want_l > 0
    np.testing.assert_array_equal(gb, want_b[keep])
    np.testing.assert_array_equal(gl, want_l[keep])
    # python reader agrees too (it preserves case; encoding uppercases)
    assert [r.upper() for r in reads if r] == [
        s.upper() for s in read_seqs(path, fastq)]


def test_fasta_roundtrip(tmp_path, rng):
    reads = simulate.shred(rng, simulate.random_genome(rng, 2000), 5, 100)
    reads += ["ACGTNNACGT", "acgtacgt"]
    _roundtrip(tmp_path, simulate.write_fasta, False, reads)


def test_fastq_roundtrip(tmp_path, rng):
    reads = simulate.shred(rng, simulate.random_genome(rng, 2000), 5, 100)
    _roundtrip(tmp_path, simulate.write_fastq, True, reads)


def test_gzip_and_multiline_fasta(tmp_path, rng):
    import gzip

    seqs = ["ACGT" * 50, "TTTTGGGG" * 10]
    path = str(tmp_path / "m.fa.gz")
    with gzip.open(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            for j in range(0, len(s), 30):  # wrapped lines
                f.write(s[j : j + 30] + "\n")
    got = []
    for bases, lens in NV.native_batch_iter(path, False, 8, 250):
        for i in range(int((lens > 0).sum())):
            got.append("".join("ACGTN"[b] for b in bases[i, : lens[i]]))
    assert got == seqs


def test_truncation_and_empty_file(tmp_path):
    path = str(tmp_path / "t.fa")
    with open(path, "w") as f:
        f.write(">a\n" + "A" * 500 + "\n")
    [(bases, lens)] = list(NV.native_batch_iter(path, False, 4, 100))
    assert lens[0] == 100 and (bases[0] == 0).all()
    path2 = str(tmp_path / "e.fa")
    open(path2, "w").close()
    assert list(NV.native_batch_iter(path2, False, 4, 100)) == []
