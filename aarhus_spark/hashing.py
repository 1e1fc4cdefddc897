"""Driver-side replica of Spark SQL's ``xxhash64`` for strings.

Why this exists: the fragment store is written in ``xxhash64(term)``
order (the big shuffle's sortWithinPartitions key — an 8-byte sort
comparator instead of term bytes), so within-bucket parquet row groups
carry tight min/max statistics on the stored ``thash`` column but NOT
on ``term``.  Query-time tail-term lookups therefore push
``thash IN (...)`` down to the scan, which needs the exact same hash
values computed driver-side for a handful of query terms — without
launching a Spark job per lookup.

Spark's XxHash64 for byte strings is the standard public XXH64
algorithm (Yann Collet, xxhash.com, BSD): 32-byte stripes, then 8-byte
words, one 4-byte word, then single bytes (verified empirically —
``tests/test_round7_fixes.py`` pins equality against ``F.xxhash64``
across lengths 0..40 so any divergence fails loudly).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 with Spark's byte-string tail handling; returns a SIGNED
    int64 equal to ``F.xxhash64(lit(data))`` (default seed 42)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while off + 32 <= length:
            v1 = (_rotl((v1 + int.from_bytes(data[off:off + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + int.from_bytes(data[off + 8:off + 16], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + int.from_bytes(data[off + 16:off + 24], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + int.from_bytes(data[off + 24:off + 32], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + length) & _MASK
    while off + 8 <= length:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        off += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
