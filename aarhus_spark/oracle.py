"""Independent single-node NumPy oracle (SURVEY.md §5).

Implements the complete frozen contract (§1.3) — dedup-by-url,
docID assignment, tokenization, BM25, top-k — with plain Python
dicts and NumPy, sharing ONLY the frozen pure functions in
:mod:`textops` / :mod:`scoring` with the Spark engine. Rank-identity
of the Spark engine against this oracle operationalizes the
BASELINE.json north rule "rank-identical to the reference" (no
executable reference exists in this sandbox; SURVEY §0).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from .config import TOP_K
from .scoring import idf as _idf
from .scoring import partial as _partial
from .textops import extract, tokenize


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    urls: list[str]                      # docid -> url
    dls: np.ndarray                      # docid -> doc length
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (docids, tfs)
    df: dict[str, int] = field(default_factory=dict)
    tokens: list[list[str]] = field(default_factory=list)  # docid -> tokens

    def __post_init__(self) -> None:
        if not self.df:
            self.df = {t: int(p[0].size) for t, p in self.postings.items()}


def build(rows: list[dict]) -> OracleIndex:
    """Build the oracle index from rows with keys
    (url, warc_ts, html, text, lang). Applies the full frozen
    pipeline: lang='en' filter, non-empty text, dedup latest-wins,
    E(html) when text is null, lexicographic dense docids.
    """
    # dedup by url: keep max warc_ts; ties broken by max text — fully
    # deterministic under any row order / partitioning (§1.3.3).
    # NULL text sorts strictly BELOW every string including '' —
    # mirroring the engine's desc_nulls_last exactly (build.py), so at a
    # warc_ts tie between text='' and text=NULL both engines keep ''.
    def _key(r: dict) -> tuple:
        t = r.get("text")
        return (r["warc_ts"], t is not None, t or "")

    best: dict[str, dict] = {}
    for r in rows:
        u = r["url"]
        if u not in best or _key(r) > _key(best[u]):
            best[u] = r
    # filters (P2, P3) after text materialization
    docs: dict[str, str] = {}
    for u, r in best.items():
        if r.get("lang") != "en":
            continue
        text = r.get("text")
        if text is None:
            text = extract(r.get("html"))
        if not text:
            continue
        docs[u] = text
    urls = sorted(docs)  # bytewise lexicographic (ASCII corpus)
    n = len(urls)
    dls = np.zeros(n, dtype=np.int64)
    post: dict[str, list[tuple[int, int]]] = {}
    all_toks: list[list[str]] = []
    for docid, u in enumerate(urls):
        toks = tokenize(docs[u])
        all_toks.append(toks)
        dls[docid] = len(toks)
        for term, tf in Counter(toks).items():
            post.setdefault(term, []).append((docid, tf))
    postings = {
        t: (
            np.array([d for d, _ in ps], dtype=np.int64),
            np.array([tf for _, tf in ps], dtype=np.int64),
        )
        for t, ps in post.items()
    }
    avgdl = float(dls.sum()) / n if n else 0.0
    return OracleIndex(n_docs=n, avgdl=avgdl, urls=urls, dls=dls,
                       postings=postings, tokens=all_toks)


def _brute_min_window(pos_lists: list[list[int]]) -> int:
    """Smallest max−min over every choice of one position per list —
    deliberately the brute-force cartesian product (itertools.product),
    NOT the engine's two-pointer sweep, so the oracle's width is an
    algorithmically independent check. Fixture docs are small; the
    product over per-term occurrence lists stays tiny."""
    if len(pos_lists) <= 1:
        return 0
    from itertools import product
    return min(max(c) - min(c) for c in product(*pos_lists))


def search(index: OracleIndex, qtext: str | None, k: int = TOP_K,
           neg_qtext: str | None = None,
           min_should_match: int | None = None,
           require_all: bool = False,
           must_qtext: str | None = None,
           score_mode: str = "bm25") -> list[tuple[int, int, float]]:
    """BM25 top-k for one query -> [(rank, docid, score)], ordered by
    (score desc, docid asc); term sum in sorted term order.

    ES bool semantics (mirrors operators/search.py, independently):
    ``require_all`` = bool.must over every qtext term — every analyzed
    term (OOV included) must match; ``min_should_match=m`` — at least
    m distinct analyzed should terms must match, score over the
    matched ones; ``neg_qtext`` = bool.must_not — docs matching ANY
    excluded term are dropped, excluded terms never score;
    ``must_qtext`` = mixed bool — its analyzed terms (OOV included)
    must ALL match while qtext becomes the optional should clauses
    (gated by min_should_match, default 0); a term in both clauses
    counts once, as must."""
    should = sorted(set(tokenize(qtext))) if qtext is not None else []
    must = sorted(set(tokenize(must_qtext))) if must_qtext is not None else None
    if must is not None:
        should = [t for t in should if t not in must]
    pos = sorted(set(should) | set(must or []))
    acc: dict[int, float] = {}
    cnt_m: dict[int, int] = {}
    cnt_s: dict[int, int] = {}
    for t in pos:  # sorted order fixes FP addition order (§1.3.4)
        if t not in index.postings:
            continue
        docids, tfs = index.postings[t]
        w = _idf(index.df[t], index.n_docs)
        contrib = w * _partial(tfs, index.dls[docids], index.avgdl)
        tgt = cnt_m if (must is not None and t in must) else cnt_s
        for d, c in zip(docids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
            tgt[d] = tgt.get(d, 0) + 1
    if must is not None:
        acc = {d: s for d, s in acc.items() if cnt_m.get(d, 0) == len(must)}
        if min_should_match is not None:
            acc = {d: s for d, s in acc.items()
                   if cnt_s.get(d, 0) >= min_should_match}
    else:
        m = len(should) if require_all else min_should_match
        if m is not None:
            acc = {d: s for d, s in acc.items() if cnt_s.get(d, 0) >= m}
    if neg_qtext is not None:
        excl: set[int] = set()
        for t in set(tokenize(neg_qtext)):
            if t in index.postings:
                excl.update(index.postings[t][0].tolist())
        acc = {d: s for d, s in acc.items() if d not in excl}
    if score_mode == "proximity":
        # s × 1/(1 + min window width over matched positive terms) —
        # positions re-derived from the raw token lists (not from any
        # postings structure), width by brute-force product
        adj: dict[int, float] = {}
        for d, s in acc.items():
            toks = index.tokens[d]
            pls = []
            for t in pos:
                pl = [i for i, tok in enumerate(toks) if tok == t]
                if pl:
                    pls.append(pl)
            adj[d] = s * (1.0 / (1.0 + float(_brute_min_window(pls))))
        acc = adj
    elif score_mode != "bm25":
        raise ValueError(f"unknown score_mode {score_mode!r}")
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]


def search_all(index: OracleIndex, queries: list[tuple[int, str]], k: int = TOP_K) -> list[tuple[int, int, int, float]]:
    """[(query_id, rank, docid, score)] for a query set."""
    out = []
    for qid, qtext in queries:
        out.extend((qid, r, d, s) for r, d, s in search(index, qtext, k))
    return out


def search_phrase_prefix(index: OracleIndex, qtext: str, k: int = TOP_K,
                         max_expansions: int = 50) -> list[tuple[int, int, float]]:
    """ES match_phrase_prefix twin, brute force over the raw token
    lists (no postings machinery): the analyzed phrase's last token is
    a prefix, expanded against the vocabulary df-desc / term-asc with
    a ``max_expansions`` cap (the engine's declared rewrite cap); a
    doc matches iff the exact sequence fixed+[e] occurs for some
    expansion e; score = BM25 sum over the sorted distinct union of
    the fixed terms and the expansions that complete the phrase in
    that doc."""
    toks = tokenize(qtext)
    if not toks:
        return []
    fixed, prefix = toks[:-1], toks[-1]
    cand = sorted((t for t in index.postings if t.startswith(prefix)),
                  key=lambda t: (-index.df[t], t))[:max_expansions]
    exps = set(cand)
    n_fixed = len(fixed)
    matched: dict[int, set] = {}   # docid -> matched expansion terms
    for d, dtoks in enumerate(index.tokens):
        for i in range(len(dtoks) - n_fixed):
            if dtoks[i:i + n_fixed] == fixed and dtoks[i + n_fixed] in exps:
                matched.setdefault(d, set()).add(dtoks[i + n_fixed])
    out: dict[int, float] = {}
    for d, es in matched.items():
        s = 0.0
        for t in sorted(set(fixed) | es):
            docids, tfs = index.postings[t]
            j = int(np.searchsorted(docids, d))
            tf = int(tfs[j])
            s += _idf(index.df[t], index.n_docs) * float(
                _partial(np.array([tf]), np.array([int(index.dls[d])]),
                         index.avgdl)[0])
        out[d] = s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
