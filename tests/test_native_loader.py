"""Native C++ loader vs Python parser: identical outputs."""

import gzip
import subprocess

import numpy as np
import pytest

from rambl_tpu.io.fasta import write_fasta, write_fastq
from rambl_tpu.io.loader import (
    load_fasta_codes,
    load_fastq_codes,
    native_available,
    revcomp_batch_native,
)
from rambl_tpu.io.pack import decode_seq, encode_batch, revcomp_codes


needs_native = pytest.mark.skipif(
    not native_available(), reason="native loader not built (make -C native)"
)


@pytest.fixture
def fastq(tmp_path):
    recs = [
        ("r0", "ACGTACGTAC", "I" * 10),
        ("r1", "TTTTNNGGGG", "I" * 10),
        ("r2", "A" * 200, "I" * 200),  # longer than lmax -> truncated
        ("r3", "acgt", "IIII"),
    ]
    p = str(tmp_path / "reads.fastq")
    write_fastq(p, recs)
    return p, recs


@needs_native
def test_fastq_native_vs_python(fastq):
    p, recs = fastq
    lmax = 64
    codes_n, lens_n = load_fastq_codes(p, lmax)
    codes_p, lens_p = encode_batch([s for _, s, _ in recs], lmax)
    np.testing.assert_array_equal(codes_n, codes_p)
    np.testing.assert_array_equal(lens_n, lens_p)


@needs_native
def test_fastq_gz(tmp_path, fastq):
    p, recs = fastq
    gz = str(tmp_path / "reads.fastq.gz")
    with open(p, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    lmax = 64
    codes_n, lens_n = load_fastq_codes(gz, lmax)
    codes_p, lens_p = encode_batch([s for _, s, _ in recs], lmax)
    np.testing.assert_array_equal(codes_n, codes_p)
    np.testing.assert_array_equal(lens_n, lens_p)


@needs_native
def test_fasta_native_vs_python(tmp_path):
    recs = [("s0", "ACGT" * 30), ("s1", "GGNNTT"), ("s2", "T")]
    p = str(tmp_path / "refs.fasta")
    write_fasta(p, recs, width=13)  # multi-line records
    lmax = 80
    codes_n, lens_n = load_fasta_codes(p, lmax)
    codes_p, lens_p = encode_batch([s for _, s in recs], lmax)
    np.testing.assert_array_equal(codes_n, codes_p)
    np.testing.assert_array_equal(lens_n, lens_p)


@needs_native
def test_revcomp_native(fastq):
    p, recs = fastq
    codes, lens = load_fastq_codes(p, 64)
    np.testing.assert_array_equal(
        revcomp_batch_native(codes, lens), revcomp_codes(codes, lens)
    )
