import numpy as np

from muchsalsa_tpu.utils.seq import (
    decode_2bit,
    encode_2bit,
    reverse_complement,
    reverse_complement_u8,
    str_slice,
    sub_sequence,
    wrap_sequence,
)


def test_reverse_complement_str():
    # only upper-case ACGT map; others pass through (SequenceUtils.cpp:46-57)
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAAC") == "GTTT"
    assert reverse_complement("ANnT") == "AnNT"


def test_reverse_complement_bytes_roundtrip():
    s = b"ACGTTGCA"
    assert reverse_complement(reverse_complement(s)) == s


def test_reverse_complement_u8():
    arr = np.frombuffer(b"ACGT", dtype=np.uint8)
    assert reverse_complement_u8(arr).tobytes() == b"ACGT"
    arr = np.frombuffer(b"AAG", dtype=np.uint8)
    assert reverse_complement_u8(arr).tobytes() == b"CTT"


def test_str_slice_matches_reference_semantics():
    s = "ABCDEFGH"
    # strSlice(s, i, j) keeps [i, j] inclusive
    assert str_slice(s, 0, 3) == "ABCD"
    assert str_slice(s, 2, 2) == "C"
    # clamps at the end
    assert str_slice(s, 5, 99) == "FGH"
    # negative indices are python-style
    assert str_slice(s, -3, -1) == "FGH"
    # end < start collapses to single char at start (reference max(j, i))
    assert str_slice(s, 4, 1) == "E"


def test_sub_sequence_reference_extra_base():
    s = "ABCDEFGH"
    # the C++ callers pass right+1 into strSlice, so [l, r] fetches r+1 too
    assert sub_sequence(s, 1, 3, True) == "BCDE"
    # clamped at sequence end
    assert sub_sequence(s, 5, 7, True) == "FGH"


def test_wrap_sequence():
    assert wrap_sequence("A" * 125, 60) == "A" * 60 + "\n" + "A" * 60 + "\n" + "A" * 5
    assert wrap_sequence("AC", 60) == "AC"
    assert wrap_sequence("", 60) == ""


def test_encode_decode():
    codes = encode_2bit(b"ACGTacgtN-")
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4]
    assert decode_2bit(codes) == b"ACGTACGTNN"
