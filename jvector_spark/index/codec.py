"""Posting-block codec: delta-encoded docID gaps + LEB128 varint packing,
vectorized in numpy (no per-element Python loops on the hot path).

This is the text-domain analog of the reference's lossy PQ encode/decode
(jvector-base/.../quantization/ProductQuantization.java:244-446, surveyed
C2/C3) — except ours is *lossless*: decode(encode(x)) == x exactly, enforced
by property tests (mirroring the reference's round-trip suite,
jvector-tests/.../TestCompressedVectors.java:43-116).

Wire format per block:
    doc_ids: varint(gap_0), varint(gap_1), ...   gap_0 = doc_ids[0] - base
    tfs:     varint(tf_0), varint(tf_1), ...
where base is the block's logical predecessor (0 for the first block of a
(term, salt) run; otherwise the previous block's max_doc_id). Gaps within a
block are strictly positive except gap_0 which may be 0.

LEB128: little-endian 7-bit groups, high bit = continuation.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit worst case


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte-length per value: ceil(bits/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 is unsafe at 2^53; use frexp on uint64 through shifts
    vv = v.copy()
    while np.any(vv > 0):
        nbits[vv > 0] += 1
        vv >>= np.uint64(7)
    nbits[~nz] = 1
    total = int(nbits.sum())
    out = np.zeros(total, dtype=np.uint8)
    # positions: cumulative offsets
    ends = np.cumsum(nbits)
    starts = ends - nbits
    # fill byte-by-byte over at most 10 rounds (vectorized across values)
    rem = v.copy()
    active = np.ones(v.shape, dtype=bool)
    pos = starts.copy()
    for _ in range(_MAX_VARINT_BYTES):
        if not np.any(active):
            break
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
        more = active & (rem > 0)
        byte[more] |= 0x80
        out[pos[active]] = byte[active]
        pos[active] += 1
        active = more
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Vectorized LEB128 decode of exactly n values from buf."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_terminal = (b & 0x80) == 0
    # index of each value's terminal byte; value i spans (prev_end, end_i]
    ends = np.flatnonzero(is_terminal)[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    maxlen = int(lengths.max())
    vals = np.zeros(n, dtype=np.uint64)
    for k in range(maxlen):  # ≤10 rounds, vectorized across values
        take = lengths > k
        vals[take] |= (b[starts[take] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * k
        )
    return vals


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, base: int) -> tuple[bytes, bytes]:
    """Encode one sorted block; base = previous block's max_doc_id (or 0)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty(d.shape, dtype=np.uint64)
    gaps[0] = np.uint64(d[0] - base)
    gaps[1:] = np.diff(d).astype(np.uint64)
    return varint_encode(gaps), varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_block(
    doc_ids_packed: bytes, tfs_packed: bytes, n: int, base: int
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_block: (doc_ids int64 asc, tfs int64)."""
    gaps = varint_decode(doc_ids_packed, n).astype(np.int64)
    gaps[0] += base
    return np.cumsum(gaps), varint_decode(tfs_packed, n).astype(np.int64)


# ---------------------------------------------------------------------------
# binary packing (PFor-family) — evaluated alternative to LEB128
# ---------------------------------------------------------------------------

def bitpack_encode(values: np.ndarray) -> tuple[bytes, int]:
    """Frame-of-reference binary packing: every value stored at the block's
    max bitwidth (NewPFD without exceptions — our gap distributions are
    tight enough that exception patching buys nothing; see docs/SCALE.md).
    Returns (payload, width). Vectorized: a (n × width) bit matrix packed
    little-bit-first."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", 0
    mx = int(v.max())
    width = max(1, mx.bit_length())
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(
        np.uint8
    )
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes(), width


def bitpack_decode(buf: bytes, count: int, width: int) -> np.ndarray:
    """Exact inverse of :func:`bitpack_encode`."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=count * width, bitorder="little"
    ).reshape(count, width)
    return (bits.astype(np.uint64) << np.arange(width, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
