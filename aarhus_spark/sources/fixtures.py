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
