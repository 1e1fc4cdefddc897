"""Deterministic synthetic fixtures (FIXTURES.md §1-2, seed=42).

Generates the Common-Crawl-style ``pages`` corpus and the 50-query
reference query set, entirely self-contained (BASELINE.json north
rule: no external data). The html is rendered so that the frozen
extractor E(html) yields the text column **byte-identically** —
asserted in tests and by construction here.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from ..textops import extract

SEED = 42
_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)

# ~5000-term vocabulary of ascii [a-z0-9]+ tokens; the head of the
# Zipf distribution lands on common words to exercise skew salting.
_HEAD = ["the", "of", "and", "to", "a", "in", "is", "for", "on", "data"]


def _vocab(n: int = 5000) -> list[str]:
    vocab = list(_HEAD)
    base = ["spark", "index", "query", "page", "web", "crawl", "text", "term",
            "doc", "score", "rank", "join", "merge", "sort", "hash", "scan"]
    i = 0
    while len(vocab) < n:
        b = base[i % len(base)]
        vocab.append(f"{b}{i}")
        i += 1
    return vocab[:n]


def gen_pages(n_rows: int = 2000, seed: int = SEED, dup_frac: float = 0.01) -> pd.DataFrame:
    """pages(url, warc_ts, html, text, lang) per FIXTURES.md §1."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    v = len(vocab)
    # Zipf(s≈1.07) over the vocabulary
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** -1.07
    probs /= probs.sum()
    # url hosts ~ Zipf(s=1.1) over 50 hosts
    hranks = np.arange(1, 51, dtype=np.float64)
    hprobs = hranks ** -1.1
    hprobs /= hprobs.sum()
    hosts = rng.choice(50, size=n_rows, p=hprobs)
    lens = rng.integers(20, 501, size=n_rows)
    langs = rng.choice(np.array(["en", "de", "es", "zh", "fr"]),
                       size=n_rows, p=[0.90, 0.025, 0.025, 0.025, 0.025])
    rows = []
    for i in range(n_rows):
        toks = rng.choice(vocab, size=lens[i], p=probs)
        text = " ".join(toks.tolist())
        url = f"https://host{hosts[i]}.example/p{i % 7}/{i}"
        ts = _BASE_TS + _dt.timedelta(seconds=int(i))
        html = (
            "<html><head><script>junk();\nvar x=1;</script>"
            "<style>p {color: red}</style></head>"
            f"<body><p>{text.replace('and', '&amp;nd', 1) if ' and ' in f' {text} ' else text}</p></body></html>"
        ).encode()
        rows.append((url, ts, html, text, langs[i]))
    # ~1% deliberate duplicate urls with +1 day ts and different text
    # (dedup P4: latest warc_ts wins)
    n_dup = max(1, int(n_rows * dup_frac))
    dup_idx = rng.choice(n_rows, size=n_dup, replace=False)
    for i in dup_idx:
        url, ts, _, _, lang = rows[i]
        toks = rng.choice(vocab, size=int(lens[i]), p=probs)
        text = " ".join(toks.tolist())
        html = f"<html><body><p>{text}</p></body></html>".encode()
        rows.append((url, ts + _dt.timedelta(days=1), html, text, lang))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    # invariant: E(html) must reproduce text byte-identically — fix up
    # the entity-bearing rows by regenerating text from html (keeps the
    # corpus's entity/extraction coverage while holding the invariant).
    pdf["text"] = pdf["html"].map(extract)
    return pdf


def gen_queries(pages: pd.DataFrame, seed: int = SEED) -> pd.DataFrame:
    """50-query reference set (FIXTURES.md §2): 10 head single, 10 tail
    single, 15 multi-term, 5 containing an absent term, 5 no-hit,
    5 tie-heavy-ish short queries."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    qs: list[str] = []
    qs += _HEAD[:10]                                     # head terms
    qs += [vocab[-(i * 97 + 11)] for i in range(10)]     # tail terms
    for i in range(15):                                  # multi-term
        k = 2 + (i % 4)
        terms = [vocab[int(x)] for x in rng.integers(0, len(vocab), size=k)]
        qs.append(" ".join(terms))
    for i in range(5):                                   # one absent term
        qs.append(f"{_HEAD[i]} zzzabsent{i}")
    qs += [f"qqqnohit{i} zzznope{i}" for i in range(5)]  # no hits at all
    qs += [" ".join([_HEAD[i], _HEAD[i + 1]]) for i in range(5)]  # tie-heavy
    return pd.DataFrame({"query_id": np.arange(len(qs), dtype=np.int64), "qtext": qs})


def pages_rows(pdf: pd.DataFrame) -> list[dict]:
    """pandas pages frame -> list-of-dict rows for the NumPy oracle."""
    return pdf.to_dict("records")


# ---------------------------------------------------------------------------
# Scalable generator: every field derives ONLY from (seed, row id) via a
# vectorized splitmix64 — deterministic and partition-independent, so it
# runs distributed under mapInPandas for bench corpora of any size
# (the loop-based gen_pages above stays as the small-fixture reference).
# ---------------------------------------------------------------------------

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def _u01(counter: np.ndarray, stream: int, seed: int) -> np.ndarray:
    h = _mix64(counter.astype(np.uint64)
               ^ _mix64(np.uint64(seed * 1_000_003 + stream) + np.zeros(1, np.uint64)))
    return h.astype(np.float64) / float(1 << 64)


def gen_pages_block(ids: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """pages rows for the given row ids (vectorized, no Python loop on
    the token axis). E(html) == text byte-identically by construction."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    vocab = np.array(_vocab())
    probs = (np.arange(1, len(vocab) + 1, dtype=np.float64)) ** -1.07
    cdf = np.cumsum(probs / probs.sum())
    hcdf = np.cumsum((np.arange(1, 51, dtype=np.float64) ** -1.1)
                     / (np.arange(1, 51, dtype=np.float64) ** -1.1).sum())

    lens = 20 + (_mix64(ids.astype(np.uint64) ^ np.uint64(seed)) % np.uint64(481)).astype(np.int64)
    hosts = np.searchsorted(hcdf, _u01(ids, 1, seed))
    lang_u = _u01(ids, 2, seed)
    langs = np.select(
        [lang_u < 0.90, lang_u < 0.925, lang_u < 0.95, lang_u < 0.975],
        ["en", "de", "es", "zh"], default="fr")

    offsets = np.concatenate(([0], np.cumsum(lens)))
    total = int(offsets[-1])
    i_arr = np.repeat(ids, lens)
    j_arr = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    tok_u = _u01(i_arr * (1 << 20) + j_arr, 3, seed)
    words = vocab[np.searchsorted(cdf, tok_u)]

    texts = []
    for k in range(n):
        texts.append(" ".join(words[offsets[k]:offsets[k + 1]]))
    urls = [f"https://host{h}.example/p{int(i) % 7}/{int(i)}"
            for h, i in zip(hosts, ids)]
    tss = [_BASE_TS + _dt.timedelta(seconds=int(i)) for i in ids]
    htmls = [(f"<html><head><script>junk();</script><style>p {{}}</style>"
              f"</head><body><p>{t}</p></body></html>").encode() for t in texts]
    pdf = pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls,
                        "text": texts, "lang": langs})

    # ~1% planted duplicates: same url, +1 day, regenerated text (stream 4)
    dup = _u01(ids, 5, seed) < 0.01
    if dup.any():
        d_ids = ids[dup]
        d_lens = 20 + (_mix64(d_ids.astype(np.uint64) ^ np.uint64(seed + 7)) % np.uint64(481)).astype(np.int64)
        d_off = np.concatenate(([0], np.cumsum(d_lens)))
        di = np.repeat(d_ids, d_lens)
        dj = np.arange(int(d_off[-1]), dtype=np.int64) - np.repeat(d_off[:-1], d_lens)
        d_words = vocab[np.searchsorted(cdf, _u01(di * (1 << 20) + dj, 4, seed))]
        d_rows = []
        for k, i in enumerate(d_ids):
            t = " ".join(d_words[d_off[k]:d_off[k + 1]])
            d_rows.append((urls[int(np.flatnonzero(ids == i)[0])],
                           _BASE_TS + _dt.timedelta(seconds=int(i), days=1),
                           f"<html><body><p>{t}</p></body></html>".encode(),
                           t, langs[int(np.flatnonzero(ids == i)[0])]))
        pdf = pd.concat([pdf, pd.DataFrame(
            d_rows, columns=["url", "warc_ts", "html", "text", "lang"])],
            ignore_index=True)
    return pdf


def gen_pages_spark(spark, n_rows: int, seed: int = SEED, partitions: int | None = None):
    """Distributed deterministic corpus: same rows for ANY partitioning."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_pages_block(pdf["id"].to_numpy(), seed)

    return (spark.range(0, n_rows, numPartitions=parts)
            .mapInPandas(gen, schema="url string, warc_ts timestamp, html binary, "
                                     "text string, lang string"))
