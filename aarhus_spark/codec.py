"""Posting-list codec: delta-gap + VByte, numpy-vectorized.

SURVEY.md §1.4 / §2.9 F9. Postings for one segment row are stored as

    varint(n) ⧺ vbyte(delta(docids)) ⧺ vbyte(tfs) ⧺ vbyte(dls)

- docids strictly ascending int64, delta-gapped (first value stored
  absolute) — Manning et al. 2008 ch.5.
- tfs, dls stored raw (small positive ints).
- dls (doc lengths) ride inside the postings so segments are fully
  self-contained: query-time BM25 needs no join against a doclens
  table — the deliberate space-for-shuffle trade documented in
  DESIGN.md (a dl of <16k costs ≤2 bytes/posting; it removes a
  10^12-row docid join from the query hot path).

VByte format: little-endian 7-bit groups, MSB set = continuation
(final byte has MSB clear). Encode/decode are numpy-vectorized —
no per-value Python loop; the decode loop is over the ≤10 byte
positions of a varint, not over values.

Non-SQL-expressible (binary payloads) → rows-only harness check
(SURVEY §2.9 F9).
"""

from __future__ import annotations

import numpy as np

_MASKS = [np.uint64(0x7F) << np.uint64(7 * i) for i in range(10)]


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int64 array to VByte bytes (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bits/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 on float is unsafe for >2^53; use a loop over
    # the 10 possible 7-bit groups instead (vectorized per group).
    nbytes = np.ones(v.shape, dtype=np.int64)
    for i in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * i))).astype(np.int64)
    del bits, nz
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    # fill group i of every value that has at least i+1 bytes
    for i in range(10):
        sel = nbytes > i
        if not sel.any():
            break
        grp = ((v[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > (i + 1)).astype(np.uint8) << 7
        out[starts[sel] + i] = grp | cont
    return out.tobytes()


def vbyte_decode(buf: np.ndarray, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``n`` VByte values from ``buf`` (uint8 array) starting at
    ``offset``. Returns (values uint64 array, next offset). Vectorized:
    loops over byte-positions (≤10), not values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    b = buf[offset:]
    is_last = (b & 0x80) == 0
    # index of the terminating byte of each of the first n values
    ends = np.flatnonzero(is_last)[:n]
    if ends.size < n:
        raise ValueError("vbyte_decode: buffer truncated")
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(n, dtype=np.uint64)
    lens = ends - starts + 1
    maxlen = int(lens.max())
    for i in range(maxlen):
        sel = lens > i
        out[sel] |= (b[starts[sel] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return out, offset + int(ends[-1]) + 1


def encode_postings(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one posting run (docids strictly ascending)."""
    docids = np.asarray(docids, dtype=np.int64)
    n = docids.size
    header = vbyte_encode(np.array([n], dtype=np.int64))
    if n == 0:
        return header
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    if n > 1 and deltas[1:].min() <= 0:
        raise ValueError("encode_postings: docids must be strictly ascending")
    return header + vbyte_encode(deltas) + vbyte_encode(tfs) + vbyte_encode(dls)


def decode_postings(payload: bytes | np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a posting run -> (docids int64, tfs int64, dls int64)."""
    buf = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, (bytes, bytearray)) else payload
    (n_arr, off) = vbyte_decode(buf, 1, 0)
    n = int(n_arr[0])
    deltas, off = vbyte_decode(buf, n, off)
    tfs, off = vbyte_decode(buf, n, off)
    dls, off = vbyte_decode(buf, n, off)
    docids = np.cumsum(deltas.astype(np.int64))
    return docids, tfs.astype(np.int64), dls.astype(np.int64)


def concat_postings(payloads: list[bytes]) -> bytes:
    """k-way merge of posting runs with pairwise-disjoint, ordered docid
    ranges (the range-salted case, SURVEY §2.3 T7): decode, verify
    global ascending order, re-encode as one run."""
    parts = [decode_postings(p) for p in payloads if p is not None]
    parts = [p for p in parts if p[0].size]
    if not parts:
        return encode_postings(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    docids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    order = np.argsort(docids, kind="stable")
    return encode_postings(docids[order], tfs[order], dls[order])
