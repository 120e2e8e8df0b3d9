"""2-bit packing / encoding roundtrips (SURVEY.md section 4.2 unit tier)."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from rambl_tpu.io.pack import (
    decode_seq,
    encode_seq,
    encode_batch,
    kmer_keys,
    pack_2bit,
    revcomp_codes,
    unpack_2bit,
)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode_seq(encode_seq(s)) == s


def test_encode_lowercase_and_junk():
    c = encode_seq("acgtX-")
    assert c.tolist() == [0, 1, 2, 3, 4, 4]


@given(st.lists(st.integers(0, 3), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_pack_unpack_roundtrip(codes):
    arr = np.asarray(codes, dtype=np.int8)
    assert (unpack_2bit(pack_2bit(arr), len(codes)) == arr).all()


def test_pack_batch_shape():
    arr = np.zeros((4, 33), dtype=np.int8)
    w = pack_2bit(arr)
    assert w.shape == (4, 3)


def test_revcomp():
    c = encode_seq("AACGT")
    rc = revcomp_codes(c)
    assert decode_seq(rc) == "ACGTT"
    # involution
    assert decode_seq(revcomp_codes(rc)) == "AACGT"


def test_revcomp_batch_keeps_padding():
    batch, lens = encode_batch(["ACG", "TTTTT"], 8)
    rc = revcomp_codes(batch, lens)
    assert decode_seq(rc[0][:3]) == "CGT"
    assert (rc[0][3:] == 4).all()
    assert decode_seq(rc[1][:5]) == "AAAAA"


def test_kmer_keys_orders_lexicographically():
    keys, valid = kmer_keys(encode_seq("AACA"), 3)
    # AAC < ACA numerically because big-endian packing
    assert valid.all()
    assert keys[0] < keys[1]


def test_kmer_keys_n_invalid():
    keys, valid = kmer_keys(encode_seq("ACGNA"), 3)
    assert valid.tolist() == [True, False, False]
