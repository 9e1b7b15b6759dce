"""Property tests for the posting-block codec — the analog of the
reference's compression round-trip suite (TestCompressedVectors.java:43-116):
decode(encode(x)) == x exactly, across edge cases (single element, zero
first gap, huge gaps, block boundaries)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jvector_spark.index.codec import (
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr), len(xs)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_block_roundtrip(ids, tfs, base_jitter):
    ids = sorted(ids)
    tfs = (tfs * ((len(ids) // len(tfs)) + 1))[: len(ids)]
    base = max(0, ids[0] - base_jitter)
    d, t = encode_block(np.array(ids), np.array(tfs), base)
    rid, rtf = decode_block(d, t, len(ids), base)
    assert rid.tolist() == ids
    assert rtf.tolist() == tfs


def test_varint_empty_and_zero():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"", 0).tolist() == []
    assert varint_decode(varint_encode(np.array([0], dtype=np.uint64)), 1).tolist() == [0]


def test_known_leb128_bytes():
    # 300 = 0b100101100 -> 0xAC 0x02
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_decode(b"\xac\x02", 1).tolist() == [300]


# --- binary packing (PFor-family alternative codec) -------------------------

def test_bitpack_roundtrip_random():
    import numpy as np

    from jvector_spark.index.codec import bitpack_decode, bitpack_encode

    rng = np.random.default_rng(5)
    for _ in range(40):
        n = int(rng.integers(0, 500))
        hi = int(rng.choice([1, 2, 7, 255, 2**16, 2**31, 2**63 - 1]))
        v = rng.integers(0, hi, size=n, dtype=np.uint64)
        buf, w = bitpack_encode(v)
        out = bitpack_decode(buf, n, w)
        assert np.array_equal(out, v)


def test_bitpack_edge_cases():
    import numpy as np

    from jvector_spark.index.codec import bitpack_decode, bitpack_encode

    assert bitpack_encode(np.array([], dtype=np.uint64)) == (b"", 0)
    buf, w = bitpack_encode(np.array([0, 0, 0], dtype=np.uint64))
    assert w == 1 and list(bitpack_decode(buf, 3, w)) == [0, 0, 0]
    big = np.array([2**63 - 1, 1], dtype=np.uint64)
    buf, w = bitpack_encode(big)
    assert np.array_equal(bitpack_decode(buf, 2, w), big)
