"""ES/Lucene span queries (round 7): span_near (ordered + unordered),
span_not, span_first — positional structure queries over the format-v5
postings, the last Lucene query family aarhus's ES layer exposes that
the engine did not yet answer [PK — ES span queries / Lucene SpanQuery;
SURVEY §2 Q37-Q39].

Semantics (documented contracts, Lucene parity for single-term
clauses — each clause span occupies exactly one position):

- ``span_near(clauses, slop, in_order=True)``: a doc matches iff one
  position p_i can be chosen per clause (the SAME term in two clauses
  needs two distinct positions) with p_1 < p_2 < … < p_n and total
  intervening slack ``p_n − p_1 − (n−1) ≤ slop`` — Lucene
  NearSpansOrdered's match-length budget for unit-length spans.
- ``in_order=False``: any arrangement, same budget on the covering
  window: ``(max p − min p) − (n−1) ≤ slop`` — NearSpansUnordered.
  This is EXACTLY the engine's sloppy-phrase window feasibility with
  all phrase offsets 0 and slop' = slop + n − 1, so the unordered path
  reuses the Q9 kernel (`_sloppy_match`) verbatim — including its
  distinct-positions handling for repeated clause terms.
- ``span_not(include_phrase, exclude, pre, post)``: the include clause
  is an EXACT phrase (the common ES idiom — "this phrase, not near
  X"); a doc matches iff SOME occurrence [a, a+L−1] of the phrase has
  no ``exclude``-term position inside [a−pre, a+L−1+post] — Lucene
  SpanNotQuery with its pre/post guard bands. The exclude term is
  never required, never scored (the positional counterpart of
  bool.must_not).
- ``span_first(term, end)``: the term occurs at position < ``end``
  (0-based token index, the postings' stored convention) — Lucene
  SpanFirstQuery over a unit span.

Matching docs are ranked by the standard disjunctive BM25 sum over the
distinct POSITIVE clause terms (frozen fold order §1.3.4) — the same
declared contract as Q8/Q9: the match filter is the thing under test
and the DuckDB twin is the disjunctive oracle restricted to matching
docs.

Plan shape: identical to search_phrase — candidate segment rows for
the clause terms (term-IN parquet pushdown) group per query
(applyInPandas), the shared two-pass decode
(`search._decode_candidate_positions`) intersects docids on scoring
streams before any position byte is touched, and position streams
decode only for blocks still holding a candidate. Single-group and
chunk-parallel range dispatch like Q8 (a doc's spans are evaluated
entirely inside the one range holding its docid).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TOP_K
from ..scoring import partial as _partial
from ..textops import tokenize
from .search import (RESULT_SCHEMA, _as_dirs, _chain_stats,
                     _decode_candidate_positions, _dfg_from_rows,
                     _dfg_or_none, _exact_anchor_keys, _idf, _sloppy_match,
                     candidate_segments, default_n_ranges, docid_domain,
                     local_df)

_MASK32 = np.int64((1 << 32) - 1)


def _pos_keys(per_term: dict, term: str, inter: np.ndarray) -> np.ndarray:
    """Sorted int64 keys ``(local_docid << 32) | position`` of every
    occurrence of ``term`` among the candidate docs (local = index
    into ``inter``). Empty when the term has no candidate rows."""
    if term not in per_term:
        return np.array([], dtype=np.int64)
    d, tf, _dl, pos = per_term[term]
    docc = np.repeat(d, tf)
    local = np.searchsorted(inter, docc).astype(np.int64)
    return (local << np.int64(32)) | pos.astype(np.int64)


def _ordered_chain_locals(clause_keys: list[np.ndarray],
                          width: int) -> np.ndarray:
    """Feasibility of the ORDERED chain: from every start position of
    clause 1, greedily take the smallest strictly-later position of
    each next clause in the same doc (greedy is optimal — the earliest
    valid continuation minimizes the end without excluding any later
    choice), then keep starts whose chain stays within ``width``
    positions end-to-start. Fully vectorized: one searchsorted per
    clause over the (local_docid << 32 | pos) key stream. Returns the
    sorted unique local docids with a feasible chain."""
    starts = clause_keys[0]
    cur = starts
    for nxt in clause_keys[1:]:
        if not cur.size or not nxt.size:
            return np.array([], dtype=np.int64)
        idx = np.searchsorted(nxt, cur, side="right")
        valid = idx < nxt.size
        cand = nxt[np.minimum(idx, nxt.size - 1)]
        ok = valid & ((cand >> np.int64(32)) == (cur >> np.int64(32)))
        starts, cur = starts[ok], cand[ok]
    if not cur.size:
        return np.array([], dtype=np.int64)
    ok = (cur & _MASK32) - (starts & _MASK32) <= width
    return np.unique(starts[ok] >> np.int64(32))


def _span_score(per_term: dict, terms: list[str], matched: np.ndarray,
                dfg: dict, n_docs: int, avgdl: float, qid: int,
                k: int) -> pd.DataFrame:
    """Disjunctive BM25 over the distinct positive terms, restricted to
    the matched docs — the Q8 scoring contract, sorted-term fold
    order."""
    scores = np.zeros(matched.size, dtype=np.float64)
    for t in sorted(set(terms)):
        d, tf, dl, _pos = per_term[t]
        sel = np.isin(d, matched, assume_unique=True)
        idx = np.searchsorted(matched, d[sel])
        scores[idx] += _idf(float(dfg[t]), n_docs) * _partial(
            tf[sel], dl[sel], avgdl)
    order = np.lexsort((matched, -scores))[:k]
    return pd.DataFrame({
        "query_id": qid,
        "rank": np.arange(1, order.size + 1, dtype=np.int32),
        "docid": matched[order],
        "score": scores[order],
    })


_EMPTY = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                       "rank": pd.Series([], dtype="int32"),
                       "docid": pd.Series([], dtype="int64"),
                       "score": pd.Series([], dtype="float64")})


def _span_near_one_query(g: pd.DataFrame, clauses: list[str], slop: int,
                         in_order: bool, n_docs: int, avgdl: float,
                         k: int, dfg: dict, range_lo: int = 0,
                         range_hi: int | None = None,
                         dead: np.ndarray | None = None) -> pd.DataFrame:
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    req = sorted(set(clauses))
    inter, per_term = _decode_candidate_positions(
        g, req, range_lo, range_hi, dead)
    if inter.size == 0:
        return _EMPTY
    width = slop + len(clauses) - 1
    if in_order:
        keys = [_pos_keys(per_term, t, inter) for t in clauses]
        matched_local = _ordered_chain_locals(keys, width)
    else:
        # the Q9 window kernel with all offsets 0: max−min ≤ width,
        # distinct positions for repeated clause terms
        matched_local, _ = _sloppy_match(
            [(0, t) for t in clauses], per_term, inter, width,
            want_width=False)
    if matched_local.size == 0:
        return _EMPTY
    return _span_score(per_term, clauses, inter[matched_local], dfg,
                       n_docs, avgdl, qid, k)


def _span_not_one_query(g: pd.DataFrame, phrase: list[str], exclude: str,
                        pre: int, post: int, n_docs: int, avgdl: float,
                        k: int, dfg: dict, range_lo: int = 0,
                        range_hi: int | None = None,
                        dead: np.ndarray | None = None) -> pd.DataFrame:
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    req = sorted(set(phrase))
    inter, per_term = _decode_candidate_positions(
        g, req, range_lo, range_hi, dead, optional_terms=(exclude,))
    if inter.size == 0:
        return _EMPTY
    anchors = _exact_anchor_keys(list(enumerate(phrase)), per_term, inter)
    if anchors.size == 0:
        return _EMPTY
    ex = np.sort(_pos_keys(per_term, exclude, inter))
    if ex.size:
        L = len(phrase)
        a_local = anchors >> np.int64(32)
        a_pos = anchors & _MASK32
        lo = (a_local << np.int64(32)) | np.maximum(a_pos - pre, 0)
        hi = (a_local << np.int64(32)) | (a_pos + np.int64(L - 1 + post))
        # an anchor survives iff NO exclude position lies in [lo, hi]
        survive = np.searchsorted(ex, lo) == np.searchsorted(
            ex, hi, side="right")
        anchors = anchors[survive]
    if anchors.size == 0:
        return _EMPTY
    matched_local = np.unique(anchors >> np.int64(32))
    return _span_score(per_term, phrase, inter[matched_local], dfg,
                       n_docs, avgdl, qid, k)


def _span_first_one_query(g: pd.DataFrame, term: str, end: int,
                          n_docs: int, avgdl: float, k: int, dfg: dict,
                          range_lo: int = 0, range_hi: int | None = None,
                          dead: np.ndarray | None = None) -> pd.DataFrame:
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    inter, per_term = _decode_candidate_positions(
        g, [term], range_lo, range_hi, dead)
    if inter.size == 0:
        return _EMPTY
    keys = _pos_keys(per_term, term, inter)
    matched_local = np.unique(keys[(keys & _MASK32) < end]
                              >> np.int64(32))
    if matched_local.size == 0:
        return _EMPTY
    return _span_score(per_term, [term], inter[matched_local], dfg,
                       n_docs, avgdl, qid, k)


def _dispatch(spark: SparkSession, index_dir, queries: DataFrame,
              plans: dict, all_terms: list[str], kernel, k: int,
              n_ranges: int | None) -> DataFrame:
    """Shared single-group / chunk-parallel dispatch (the Q8 shape):
    candidate segment rows for each query's terms group per query;
    above the fan-out threshold the groups split by fixed docid ranges
    and a final window merges (exact — spans never cross a doc)."""
    from pyspark.sql.window import Window
    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    if not all_terms:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    seg = candidate_segments(spark, index_dir, all_terms)
    dfg = _dfg_or_none(spark, index_dir, all_terms, seg=seg, dead=dead)
    qdist = local_df(
        spark,
        [(qid, t) for qid, terms in plans.items() for t in sorted(set(terms))],
        "query_id long, term string")
    nr = n_ranges if n_ranges is not None else default_n_ranges(n_docs)
    if nr <= 1:
        seg_q = seg.join(F.broadcast(qdist), "term")

        def run(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
            return kernel(g, int(key[0]), n_docs, avgdl, k, dfg, 0, None,
                          dead)

        return seg_q.groupBy("query_id").applyInPandas(run, RESULT_SCHEMA)
    dom_lo, dom_hi = docid_domain(_as_dirs(index_dir))
    if dom_hi < dom_lo:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    width = max(1, (dom_hi - dom_lo + 1 + nr - 1) // nr)
    ranges = local_df(
        spark,
        [(r, dom_lo + r * width, dom_lo + (r + 1) * width - 1)
         for r in range(nr)], "rng int, lo long, hi long")
    seg2 = seg.withColumn("__max_docid",
                          F.element_at("blocks", -1)["last_docid"])
    seg_r = (seg2.join(F.broadcast(qdist), "term")
             .join(F.broadcast(ranges),
                   (F.col("__max_docid") >= F.col("lo"))
                   & (F.col("first_docid") <= F.col("hi"))))

    def run_rng(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g, int(key[0]), n_docs, avgdl, k, dfg,
                      int(g["lo"].iloc[0]), int(g["hi"].iloc[0]), dead)

    cands = seg_r.groupBy("query_id", "rng").applyInPandas(run_rng,
                                                           RESULT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def _clauses_of(qtext: str) -> list[str]:
    toks = tokenize(qtext)
    if len(toks) < 2:
        raise ValueError(f"span_near needs >= 2 clauses, got {qtext!r}")
    return toks


def search_span_near(spark: SparkSession, index_dir, queries: DataFrame,
                     slop: int = 0, in_order: bool = True, k: int = TOP_K,
                     n_ranges: int | None = None) -> DataFrame:
    """Span-near top-k: each row of ``queries`` is (query_id, qtext);
    the analyzed tokens are the single-term clauses, in clause order.
    Contract in the module docstring. Returns the Q8 result shape."""
    qrows = queries.select("query_id", "qtext").collect()
    plans = {int(r["query_id"]): _clauses_of(r["qtext"]) for r in qrows}
    all_terms = sorted({t for c in plans.values() for t in c})

    def kernel(g, qid, n_docs, avgdl, kk, dfg, lo, hi, dead):
        return _span_near_one_query(g, plans[qid], slop, in_order, n_docs,
                                    avgdl, kk, dfg, lo,
                                    hi if hi is not None else None, dead)

    return _dispatch(spark, index_dir, queries, plans, all_terms, kernel,
                     k, n_ranges)


def search_span_not(spark: SparkSession, index_dir, queries: DataFrame,
                    pre: int = 0, post: int = 0, k: int = TOP_K,
                    n_ranges: int | None = None) -> DataFrame:
    """Span-not top-k: each row of ``queries`` is (query_id, qtext,
    exclude) — qtext the exact include phrase, exclude a single term.
    Contract in the module docstring."""
    qrows = queries.select("query_id", "qtext", "exclude").collect()
    plans, excl = {}, {}
    for r in qrows:
        qid = int(r["query_id"])
        toks = tokenize(r["qtext"])
        ex = tokenize(r["exclude"])
        if not toks or len(ex) != 1:
            raise ValueError("span_not needs a phrase and ONE exclude term")
        plans[qid] = toks
        excl[qid] = ex[0]
    # exclude terms must reach the kernel's candidate rows too
    plans_all = {qid: plans[qid] + [excl[qid]] for qid in plans}
    all_terms = sorted({t for c in plans_all.values() for t in c})

    def kernel(g, qid, n_docs, avgdl, kk, dfg, lo, hi, dead):
        return _span_not_one_query(g, plans[qid], excl[qid], pre, post,
                                   n_docs, avgdl, kk, dfg, lo,
                                   hi if hi is not None else None, dead)

    return _dispatch(spark, index_dir, queries, plans_all, all_terms,
                     kernel, k, n_ranges)


def search_span_first(spark: SparkSession, index_dir, queries: DataFrame,
                      end: int, k: int = TOP_K,
                      n_ranges: int | None = None) -> DataFrame:
    """Span-first top-k: each row of ``queries`` is (query_id, qtext)
    with a SINGLE analyzed term; a doc matches iff the term occurs at
    position < ``end`` (0-based). Contract in the module docstring."""
    qrows = queries.select("query_id", "qtext").collect()
    plans = {}
    for r in qrows:
        toks = tokenize(r["qtext"])
        if len(toks) != 1:
            raise ValueError("span_first takes exactly one term")
        plans[int(r["query_id"])] = toks
    all_terms = sorted({t for c in plans.values() for t in c})

    def kernel(g, qid, n_docs, avgdl, kk, dfg, lo, hi, dead):
        return _span_first_one_query(g, plans[qid][0], end, n_docs, avgdl,
                                     kk, dfg, lo,
                                     hi if hi is not None else None, dead)

    return _dispatch(spark, index_dir, queries, plans, all_terms, kernel,
                     k, n_ranges)


def _parse_intervals(qtext: str) -> list[list[str]]:
    """``"a|b c d|e"`` → ordered clauses of any_of alternatives.
    Alternatives must be DISJOINT across clauses — with disjoint sets
    a document position can satisfy only one clause, so both the
    ordered chain and the unordered min-cover are exact without a
    distinctness pass (validated here, raised otherwise)."""
    clauses = []
    for part in qtext.split():
        alts = sorted({t for a in part.split("|") for t in tokenize(a)})
        if not alts:
            raise ValueError(f"empty intervals clause in {qtext!r}")
        clauses.append(alts)
    if len(clauses) < 2:
        raise ValueError(f"intervals needs >= 2 clauses, got {qtext!r}")
    seen: set[str] = set()
    for alts in clauses:
        if seen & set(alts):
            raise ValueError("intervals alternatives must be disjoint "
                             f"across clauses: {qtext!r}")
        seen |= set(alts)
    return clauses


def _intervals_one_query(g: pd.DataFrame, clauses: list[list[str]],
                         max_gaps: int, ordered: bool, n_docs: int,
                         avgdl: float, k: int, dfg: dict,
                         range_lo: int = 0, range_hi: int | None = None,
                         dead: np.ndarray | None = None) -> pd.DataFrame:
    from .search import _min_window_flat
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    flat = sorted({t for alts in clauses for t in alts})
    inter, per_term = _decode_candidate_positions(
        g, flat, range_lo, range_hi, dead, required_groups=clauses)
    if inter.size == 0:
        return _EMPTY
    width = max_gaps + len(clauses) - 1
    keys = [np.sort(np.concatenate(
                [_pos_keys(per_term, t, inter) for t in alts]))
            for alts in clauses]
    if ordered:
        matched_local = _ordered_chain_locals(keys, width)
    else:
        # per-doc min cover over clause labels: positions are distinct
        # across clauses by the disjointness contract, so the classic
        # k-sorted-lists window is exact
        pos = np.concatenate(keys)
        labels = np.concatenate([np.full(a.size, i, dtype=np.int64)
                                 for i, a in enumerate(keys)])
        locs = pos >> np.int64(32)
        hits = []
        for loc in np.unique(locs):
            m = locs == loc
            if np.unique(labels[m]).size < len(clauses):
                continue
            w = _min_window_flat((pos[m] & _MASK32), labels[m])
            if w <= width:
                hits.append(int(loc))
        matched_local = np.array(hits, dtype=np.int64)
    if matched_local.size == 0:
        return _EMPTY
    present = [t for t in flat if t in per_term]
    return _span_score(per_term, present, inter[matched_local], dfg,
                       n_docs, avgdl, qid, k)


def search_intervals(spark: SparkSession, index_dir, queries: DataFrame,
                     max_gaps: int = 0, ordered: bool = True,
                     k: int = TOP_K,
                     n_ranges: int | None = None) -> DataFrame:
    """ES ``intervals`` query, the ``all_of`` rule over ``any_of``
    leaves `[PK]`: each row of ``queries`` is (query_id, qtext) with
    clauses separated by spaces and per-clause alternatives by ``|``
    (``"hash|table join"`` = all_of[any_of(hash, table), join]). A doc
    matches iff one position per clause can be chosen from that
    clause's alternatives with total slack ≤ ``max_gaps`` — in clause
    order when ``ordered`` (ES ``ordered: true``), any arrangement
    otherwise — exactly the Q37 budget with any_of leaf sets
    (``max_gaps = p_n − p_1 − (n−1)`` bound for unit spans).
    Alternatives must be disjoint across clauses (validated; the
    exactness contract in :func:`_parse_intervals`).

    Candidate docs intersect GROUP UNIONS (a doc needs some
    alternative of every clause — `search._decode_candidate_positions
    required_groups`), so a rare alternative cannot empty the
    candidate set its group mate covers. Ranked by the Q8 contract:
    disjunctive BM25 over the distinct present alternatives."""
    qrows = queries.select("query_id", "qtext").collect()
    plans = {int(r["query_id"]): _parse_intervals(r["qtext"])
             for r in qrows}
    flat_plans = {qid: [t for alts in cl for t in alts]
                  for qid, cl in plans.items()}
    all_terms = sorted({t for c in flat_plans.values() for t in c})

    def kernel(g, qid, n_docs, avgdl, kk, dfg, lo, hi, dead):
        return _intervals_one_query(g, plans[qid], max_gaps, ordered,
                                    n_docs, avgdl, kk, dfg, lo,
                                    hi if hi is not None else None, dead)

    return _dispatch(spark, index_dir, queries, flat_plans, all_terms,
                     kernel, k, n_ranges)
