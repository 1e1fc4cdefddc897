"""Frozen engine constants (SURVEY.md §1.3 — the reference contract).

These values must never drift without regenerating golden files:
both the Spark engine and the independent NumPy oracle import them,
so rank-identity (BASELINE.json north rule) holds by construction
and is re-asserted in tests.
"""

# BM25 parameters — Lucene BM25Similarity defaults (BASELINE.json:6).
K1: float = 1.2
B: float = 0.75

# Top-k retrieval default (BASELINE.json metric: "BM25 top-10").
TOP_K: int = 10

# Tokenizer: max token length (ES standard analyzer drops >255 by
# default; we freeze 64 per SURVEY §1.3.2 — ASCII web text fixture
# never produces longer tokens, so equivalence is exact where tested).
MAX_TOKEN_LEN: int = 64

# Posting-list block size (postings per block-max block; Ding & Suel
# SIGIR'11 use 64-128; Lucene uses 128).
BLOCK_SIZE: int = 128

# Max postings encoded into a single segment row. A merged posting
# list longer than this is split into chunked rows (term, chunk_id)
# so no single Arrow record / executor task ever holds an unbounded
# head-term posting list — the 10^12-doc scale guard (SURVEY §7).
MAX_POSTINGS_PER_ROW: int = 1 << 20

# Skew salting: number of docid-range salts for head terms (SURVEY
# §2.3 T5). Head terms (df above the quantile threshold) are split
# into SALTS disjoint docid ranges before the big term shuffle;
# range-based (not hash-based) salting keeps each fragment
# docid-contiguous so the merge is an ordered concat, and delta-gaps
# stay small.
SALTS: int = 16

# df-quantile that defines "head term" for salting (SURVEY §2.5 A4).
HEAD_DF_QUANTILE: float = 0.999
