"""ES search-layer operators beyond ranked retrieval (round 7).

aarhus's search surface is Elasticsearch: a real user of that layer
runs aggregations (facets) alongside hits, paginates with
``search_after``, boosts recent documents with ``function_score``
decay, asks for highlighted snippets, and issues ``more_like_this``
queries [PK — ES DSL; SURVEY §0]. This module is the web-page analog
of each, built over the engine's own artifacts:

- :func:`search_matches` — the shared seam: the full scored match set
  (no top-k cut), because ES computes aggs/function_score over ALL
  matching docs, not the top k.
- :func:`search_facets` — ``aggs.terms`` over the url host.
- :func:`search_date_histogram` — ``aggs.date_histogram`` over
  ``warc_ts`` (calendar truncation, key-asc bucket order).
- :func:`search_significant_terms` — ``aggs.significant_terms``
  (JLH heuristic; fg from re-analyzed stored text, bg from the
  dictionary).
- :func:`suggest_terms` — the *term suggester* ("did you mean"):
  Levenshtein dictionary scan, ES suggest_mode semantics.
- :func:`suggest_phrases` — the *phrase suggester* analog: per-word
  candidates × conjunctive index evidence via the engine's own
  bool.must path, ranked (evidence desc, edits asc).
- :func:`search_function_score` — multiplicative exp-decay on
  ``warc_ts`` (ES ``exp`` decay function, offset=0).
- :func:`search_page` — keyset pagination on (score desc, docid asc),
  ES ``search_after``.
- :func:`search_highlight` — the ES *plain* highlighter analog: the
  stored text of each top-k hit is re-analyzed at query time and a
  token window around the first match is returned with ``<em>`` marks.
- :func:`more_like_this` — tf·idf term selection from a seed doc,
  scored as a standard BM25 disjunction, seed excluded.
- :func:`search_metric_aggs` — the ES *metric* aggregations
  (``stats``/``value_count``/``cardinality``/``percentiles``) over the
  matched set, optionally under a non-scoring ``bool.filter`` range
  clause on ``warc_ts``.
- :func:`search_boosting` — ES ``boosting`` query: negative-query
  matches are demoted (score × ``negative_boost``), never excluded.
- :func:`search_constant_score` — ES ``constant_score``: every
  matching doc scores exactly ``boost``.
- :func:`search_rescore` — ES ``rescore`` with a ``match_phrase``
  secondary: the top ``window_size`` BM25 hits are re-ranked by
  ``query_weight·bm25 + rescore_weight·phrase_score``.
- :func:`search_histogram` / :func:`search_range_agg` /
  :func:`search_filters_agg` — the remaining ES *bucket* aggs:
  fixed-interval numeric histogram (key-asc, min_doc_count 1),
  declared ranges (from-inclusive/to-exclusive, empty buckets kept),
  and keyed named filters (one codegen'd hash agg, all CASE columns).
- :func:`search_composite` — ES ``composite`` agg: bucket tuples over
  two sources in composite-key order with ``after`` keyset paging.
- :func:`search_pipeline_aggs` — ES *pipeline* aggs over a
  date_histogram parent: ``cumulative_sum``, ``derivative``,
  ``bucket_sort`` — computed on the reduced bucket rows, as in ES.
- :func:`search_collapse` — ES field ``collapse`` + ``inner_hits``:
  one representative hit per collapse key, top inner hits per group.
- :func:`search_explain` — ES ``explain: true``: the per-term BM25
  breakdown (tf, df, idf, tf norm, contribution) per top-k hit,
  recomputed from the engine's own sinks.
- :func:`percolate` — the ES *percolate* query (reverse search):
  incoming docs matched against broadcast registered queries at
  ingest — docs never shuffle.
- :func:`search_adjacency_matrix` — ES ``adjacency_matrix``: single +
  pairwise-intersection buckets of named filters, one codegen'd agg.
- :func:`global_metric_aggs` — ES ``global`` agg: the Q25 metric row
  over the WHOLE corpus, attached to every query.

Everything stays JVM-side (built-in column functions); the only
driver-side work is per-query term selection for MLT (one indexed
lookup + a tiny dictionary scan — the same shape as the Q12-Q16
dictionary rewrites).
"""

from __future__ import annotations

import os as _os
from collections import Counter
from math import log

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import TOP_K
from ..textops import tokenize
from .build import IndexPaths, read_dictionary, read_doclens
from .search import (RESULT_SCHEMA, _as_dirs, load_stats_multi, local_df,
                     localize_queries, search_phrase, search_taat,
                     search_topk)

# url host — same expression in the DuckDB twin (harness)
HOST_RE = r"^https?://([^/]+)"


def search_matches(spark: SparkSession, index_dir, queries: DataFrame,
                   **bool_kwargs) -> DataFrame:
    """All matching (query_id, docid, score) for the query set — the
    TAAT engine path without the final top-k window. Bool-query kwargs
    (require_all / min_should_match / must_qtext / neg_qtext columns)
    pass straight through to :func:`search_taat`; tombstoned docs are
    already excluded there. The result is shuffle-bounded by the
    postings of the query terms — the same bound as scored retrieval."""
    return search_taat(spark, index_dir, queries, return_matches=True,
                       **bool_kwargs)


def _doc_meta(spark: SparkSession, index_dir) -> DataFrame:
    """LIVE (docid, url, dl, warc_ts) across a chain — the doclens sink
    S4 minus tombstoned docids. Re-crawl overwrite chains allocate a
    FRESH docid for the new row and record the superseded base docid in
    the delta's tombstones/ parquet (operators/incremental.py), so
    docids never collide across dirs; liveness is purely the tombstone
    filter (broadcast anti-join, bounded by TOMBSTONE_BUDGET — the same
    device the retrieval path uses). The per-docid window stays as
    defense in depth against a duplicate-docid writer bug."""
    import pandas as _pd

    from .search import load_tombstones
    dirs = _as_dirs(index_dir)
    meta = None
    for i, d in enumerate(dirs):
        piece = (read_doclens(spark, d)
                 .withColumn("__gen", F.lit(i)))
        meta = piece if meta is None else meta.unionByName(piece)
    dead, _dl = load_tombstones(spark, dirs)
    if dead.size:
        dead_df = spark.createDataFrame(
            _pd.DataFrame({"docid": dead.astype("int64")}))
        meta = meta.join(F.broadcast(dead_df), "docid", "left_anti")
    if len(dirs) == 1:
        return meta.drop("__gen")
    w = Window.partitionBy("docid").orderBy(F.desc("__gen"))
    return (meta.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "__gen"))


def search_facets(spark: SparkSession, index_dir, queries: DataFrame,
                  n_buckets: int = 10, bucket_regex: str = HOST_RE,
                  matched: DataFrame | None = None,
                  **bool_kwargs) -> DataFrame:
    """ES ``aggs: {terms: {field: host}}`` alongside a query: bucket
    ALL matching docs by a url-derived key (``bucket_regex`` group 1 —
    host by default), count per bucket, keep the top ``n_buckets``
    buckets per query by (doc_count desc, bucket asc) — ES's terms-agg
    ordering with its deterministic key tiebreak.

    Plan shape: matched (query_id, docid, score) equi-joins the doclens
    sink on docid (both sides large at scale → shuffle join on the
    docid key, AQE-eligible), then one hash aggregation and a tiny
    per-query window over bucket counts. Returns
    (query_id, bucket, doc_count, brank)."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select(
        "docid", F.regexp_extract("url", bucket_regex, 1).alias("bucket"))
    counts = (matched.join(meta, "docid")
              .groupBy("query_id", "bucket")
              .agg(F.count("*").alias("doc_count")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("doc_count"), F.asc("bucket"))
    return (counts.withColumn("brank", F.row_number().over(w).cast("long"))
            .filter(F.col("brank") <= n_buckets)
            .select("query_id", "bucket", "doc_count", "brank"))


def search_date_histogram(spark: SparkSession, index_dir,
                          queries: DataFrame, interval: str = "minute",
                          n_buckets: int = 1000,
                          matched: DataFrame | None = None,
                          **bool_kwargs) -> DataFrame:
    """ES ``aggs: {date_histogram: {field: warc_ts, calendar_interval:
    …}}`` alongside a query: bucket ALL matching docs by the
    calendar-truncated crawl timestamp and count per bucket. ES orders
    date_histogram buckets by KEY ascending (unlike the terms agg's
    count-desc) — ``brank`` follows that; empty buckets are omitted
    (ES ``min_doc_count: 1``). The bucket key is the truncated
    timestamp formatted ``yyyy-MM-dd HH:mm:ss`` so the value is
    engine-portable (no epoch/timezone arithmetic in the compared
    output; the box and the twin both run UTC).

    Plan shape: identical to :func:`search_facets` — matched set
    equi-joins doclens on docid, one hash agg, a tiny per-query
    window. ``date_trunc`` is a JVM column expression."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select(
        "docid",
        F.date_format(F.date_trunc(interval, "warc_ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("bucket"))
    counts = (matched.join(meta, "docid")
              .groupBy("query_id", "bucket")
              .agg(F.count("*").alias("doc_count")))
    w = Window.partitionBy("query_id").orderBy(F.asc("bucket"))
    return (counts.withColumn("brank", F.row_number().over(w).cast("long"))
            .filter(F.col("brank") <= n_buckets)
            .select("query_id", "bucket", "doc_count", "brank"))


def search_significant_terms(spark: SparkSession, index_dir,
                             queries: DataFrame, docs: DataFrame,
                             n_terms: int = 10, round_to: int = 9,
                             matched: DataFrame | None = None,
                             **bool_kwargs) -> DataFrame:
    """ES ``significant_terms`` agg: terms unusually frequent in the
    query's matched docs (foreground) relative to the whole corpus
    (background). fg_df = matched docs containing the term (re-analyze
    the stored text, ES field-data style), bg_df = dictionary df,
    fg_size = |matched| per query, bg_size = N from the stats sink.

    Score is JLH (ES's classic significance heuristic):
    ``(fg%/bg%) · (fg% − bg%)`` — computed as ONE double expression
    with fixed parenthesization and rounded to ``round_to`` before
    ranking, so the DuckDB twin's libm can never flip a rank. Buckets
    rank (score desc, term asc), top ``n_terms`` per query.

    Plan shape: matched set ⋈ doclens ⋈ stored text (shuffle bounded
    by the match set — the bound ES itself pays), one explode of the
    per-doc DISTINCT token array, a hash agg on (query_id, term), a
    broadcast of per-query fg sizes, an equi-join with the dictionary
    (the engine's smallest table), a tiny per-query window. All
    JVM-side column functions."""
    if matched is None:
        # materialized once: TWO branches consume the match set
        # (fg_size agg + the docterms join). Lazy, the whole TAAT
        # scoring path would run once per branch — at 180k docs this
        # op is the heaviest ES agg, so that doubling is the dominant
        # avoidable cost (callers batching several aggs pass a shared
        # persisted `matched` instead; this covers the standalone call)
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs).localCheckpoint(eager=True)
    fg_size = matched.groupBy("query_id").agg(
        F.count("*").alias("fg_size"))
    meta = _doc_meta(spark, index_dir).select("docid", "url")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: (t != F.lit("")) & (F.length(t) <= F.lit(64)))
    docterms = (matched.join(meta, "docid")
                .join(docs.select("url", "text"), "url")
                .select("query_id",
                        F.explode(F.array_distinct(toks)).alias("term")))
    fg = docterms.groupBy("query_id", "term").agg(
        F.count("*").alias("fg_df"))
    dirs = _as_dirs(index_dir)
    dic = None
    for d in dirs:
        piece = (read_dictionary(spark, d)
                 .select("term", "df"))
        dic = piece if dic is None else dic.unionByName(piece)
    dic = dic.groupBy("term").agg(F.sum("df").alias("bg_df"))
    # bg_size = tombstone-corrected live N (the retrieval path's N_eff);
    # bg_df stays the STORED dictionary df — exactly Lucene/ES, whose
    # docFreq ignores deletions until segments merge while live-doc
    # counts exclude them (compaction purges both here)
    from .search import _chain_stats
    n_total, _, _, _dead = _chain_stats(spark, index_dir)
    fgp = F.col("fg_df").cast("double") / F.col("fg_size").cast("double")
    bgp = F.col("bg_df").cast("double") / F.lit(float(n_total))
    score = F.round((fgp / bgp) * (fgp - bgp), round_to)
    scored = (fg.join(F.broadcast(fg_size), "query_id")
              .join(dic, "term")
              .withColumn("score", score))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("term"))
    return (scored.withColumn("srank", F.row_number().over(w).cast("long"))
            .filter(F.col("srank") <= n_terms)
            .select("query_id", "srank", "term", "fg_df", "bg_df", "score"))


def suggest_terms(spark: SparkSession, index_dir, words: DataFrame,
                  max_edits: int = 2, n_suggestions: int = 5,
                  suggest_mode: str = "always") -> DataFrame:
    """ES *term suggester* ("did you mean"): for each (word_id, word)
    row, find dictionary terms within ``max_edits`` Levenshtein edits
    and rank them (distance asc, df desc, term asc) — the
    deterministic analog of ES's (score desc, freq desc) suggestion
    order, since fewer edits ⇔ higher string-similarity score.

    ``suggest_mode`` mirrors ES: ``"missing"`` suggests only for words
    absent from the dictionary, ``"popular"`` keeps only candidates
    with strictly higher df than the word's own (0 if absent),
    ``"always"`` applies no such filter. The word itself (distance 0)
    is never a suggestion.

    Plan shape: the term dictionary is the engine's SMALLEST artifact
    (one row per distinct term); ``words`` is human-scale and
    broadcast, so the scan is an embarrassingly parallel
    broadcast-nested-loop with a cheap length pre-filter ahead of the
    JVM ``levenshtein`` (threshold form — early-exits past
    ``max_edits``). Chain dirs sum df before ranking, same contract
    as the Q12-Q16 dictionary rewrites."""
    if suggest_mode not in ("always", "missing", "popular"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    dirs = _as_dirs(index_dir)
    dic = None
    for d in dirs:
        piece = (read_dictionary(spark, d)
                 .select("term", "df"))
        dic = piece if dic is None else dic.unionByName(piece)
    dic = dic.groupBy("term").agg(F.sum("df").alias("df"))
    w = words.select("word_id", F.lower(F.col("word")).alias("word"))
    own = dic.withColumnRenamed("term", "word").withColumnRenamed(
        "df", "own_df")
    w = (w.join(F.broadcast(own), "word", "left")
         .fillna(0, subset=["own_df"]))
    cand = (dic.join(F.broadcast(w),
                     F.abs(F.length("term") - F.length("word"))
                     <= int(max_edits))
            .withColumn("distance",
                        F.levenshtein("term", "word", int(max_edits)))
            .filter(F.col("distance") > 0))
    if suggest_mode == "missing":
        cand = cand.filter(F.col("own_df") == 0)
    elif suggest_mode == "popular":
        cand = cand.filter(F.col("df") > F.col("own_df"))
    win = Window.partitionBy("word_id").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term"))
    return (cand.withColumn("srank", F.row_number().over(win).cast("long"))
            .filter(F.col("srank") <= n_suggestions)
            .select("word_id", "word", "srank", "term",
                    F.col("distance").cast("long").alias("distance"), "df"))


def search_function_score(spark: SparkSession, index_dir,
                          queries: DataFrame, k: int = TOP_K,
                          origin: str = "2026-01-01 00:00:00",
                          scale_days: float = 30.0,
                          decay: float = 0.5,
                          matched: DataFrame | None = None,
                          **bool_kwargs) -> DataFrame:
    """ES ``function_score`` with an ``exp`` decay on ``warc_ts``
    (multiply mode): final = bm25 · decay^(|ts − origin| / scale),
    i.e. ES's exp decay with offset 0 — evaluated over ALL matching
    docs, then top-k, exactly as ES rescoring semantics require (a
    low-BM25 but recent doc can enter the top k). The decay is one
    JVM column expression on the matched set joined with doclens —
    no extra decode, no Python."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select("docid", "warc_ts")
    age = (F.abs(F.unix_timestamp("warc_ts")
                 - F.unix_timestamp(F.lit(origin))) / F.lit(86400.0))
    mult = F.pow(F.lit(float(decay)), age / F.lit(float(scale_days)))
    scored = (matched.join(meta, "docid")
              .withColumn("score", F.col("score") * mult))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def search_page(spark: SparkSession, index_dir, queries: DataFrame,
                page_size: int = TOP_K, after: DataFrame | None = None,
                round_to: int | None = None, matched: DataFrame | None = None,
                **bool_kwargs) -> DataFrame:
    """ES ``search_after`` keyset pagination on the deterministic sort
    key (score desc, docid asc). ``after`` is (query_id, after_score,
    after_docid) — the sort key of the LAST hit of the previous page;
    rows with no cursor for their query start at page 1. Keyset, not
    offset: the filter prunes before the per-query window, so deep
    pages never rank what earlier pages already returned — the same
    reason ES deprecated from+size for deep paging.

    ``round_to`` ranks and compares on round(score, round_to) instead
    of the raw double — the sort-key choice the harness twin uses so
    an FP-summation-order difference can never flip a page boundary."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    key = (F.round(F.col("score"), round_to) if round_to is not None
           else F.col("score"))
    matched = matched.withColumn("__key", key)
    if after is not None:
        matched = (
            matched.join(F.broadcast(after), "query_id", "left")
            .filter(F.col("after_score").isNull()
                    | (F.col("__key") < F.col("after_score"))
                    | ((F.col("__key") == F.col("after_score"))
                       & (F.col("docid") > F.col("after_docid"))))
            .drop("after_score", "after_docid"))
    w = Window.partitionBy("query_id").orderBy(F.desc("__key"),
                                               F.asc("docid"))
    return (matched.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= page_size)
            .select("query_id", "rank", "docid",
                    F.col("__key").alias("score")))


def search_highlight(spark: SparkSession, index_dir, queries: DataFrame,
                     docs: DataFrame, k: int = TOP_K,
                     window: int = 4, n_ranges: int | None = None,
                     round_to: int | None = None) -> DataFrame:
    """ES *plain*-highlighter analog over the top-k hits: re-analyze
    each hit's stored text at query time (exactly what ES's plain
    highlighter does — it re-runs the analyzer on the field text) and
    return one snippet: the ±``window`` token context around the FIRST
    occurrence of any analyzed query term, matched tokens wrapped in
    ``<em>…</em>``.

    ``docs`` is a (url, text) source in the pages shape; hits join it
    through the doclens docmap. The whole fragment pipeline is built-in
    column functions over the k·|queries| hit rows only — tokenize =
    lower + regexp split (the frozen T(text) for ASCII alnum runs),
    positions via array_position, snippet via slice + transform +
    array_join. Returns (query_id, rank, docid, snippet)."""
    queries = localize_queries(spark, queries)  # top-k + analysis passes
    top = search_topk(spark, index_dir, queries, k=k, n_ranges=n_ranges)
    if round_to is not None:
        w0 = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", round_to)), F.asc("docid"))
        top = (top.withColumn("rank", F.row_number().over(w0)))
    meta = _doc_meta(spark, index_dir).select("docid", "url")
    from .search import _QueryAnalysis
    qa = _QueryAnalysis(spark, queries)
    qarr = local_df(
        spark,
        [(int(q), sorted(set(g))) for q, g in
         qa.qterms_pdf.groupby("query_id")["term"]],
        "query_id long, qterms array<string>")
    hit = (top.join(meta, "docid")
           .join(docs.select("url", "text"), "url")
           .join(F.broadcast(qarr), "query_id"))
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: (t != F.lit("")) & (F.length(t) <= F.lit(64)))
    hit = hit.withColumn("toks", toks)
    # first (1-based) position of any query term; hits always match ≥1
    # positive term, so the min is well-defined on the disjunctive path
    firstpos = F.array_min(F.filter(
        F.transform(F.col("qterms"),
                    lambda t: F.array_position(F.col("toks"), t)),
        lambda p: p > 0))
    hit = hit.withColumn("fp", firstpos.cast("int"))
    start = F.greatest(F.lit(1), F.col("fp") - F.lit(window))
    length = F.col("fp") - start + F.lit(window) + F.lit(1)
    frag = F.slice(F.col("toks"), start, length)
    marked = F.transform(
        frag,
        lambda t: F.when(F.array_contains(F.col("qterms"), t),
                         F.concat(F.lit("<em>"), t, F.lit("</em>")))
                   .otherwise(t))
    return (hit.withColumn("snippet", F.array_join(marked, " "))
            .select("query_id", "rank", "docid", "snippet"))


# MLT defaults — ES MoreLikeThis: max_query_terms=25; selection score
# is tf·idf with idf = ln(1 + N/df) (our declared deterministic
# variant), ties broken by term asc
MLT_MAX_QUERY_TERMS = 25


def mlt_select_terms(spark: SparkSession, index_dir, seed_text: str,
                     max_query_terms: int = MLT_MAX_QUERY_TERMS,
                     min_term_freq: int = 1,
                     min_doc_freq: int = 1) -> list[str]:
    """ES MLT "interesting terms" selection from a seed document's
    text: tokenize with the frozen analyzer, keep terms with
    tf ≥ min_term_freq and df ≥ min_doc_freq, rank by
    round(tf·ln(1 + N/df), 9) desc (term asc tiebreak), take
    max_query_terms — the rounding makes the selection key exactly
    reproducible across engines (the harness DuckDB twin computes the
    identical key), so a last-ulp libm difference can never swap the
    cut-off term. df comes from the dictionary with a ``term IN``
    pushdown; N from the stats sink. Returns the selected terms
    sorted."""
    tf = Counter(tokenize(seed_text))
    cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cand:
        return []
    dirs = _as_dirs(index_dir)
    n_docs, _, _ = load_stats_multi(dirs)
    dfm: Counter = Counter()
    for d in dirs:
        rows = (read_dictionary(spark, d)
                .select("term", "df")
                .filter(F.col("term").isin(cand)).collect())
        for r in rows:
            dfm[r["term"]] += int(r["df"])
    # max(min_doc_freq, 1): with min_doc_freq=0 an out-of-dictionary
    # term would pass the filter and divide by dfm[t] == 0
    scored = [(t, round(tf[t] * log(1.0 + n_docs / dfm[t]), 9))
              for t in cand if dfm.get(t, 0) >= max(min_doc_freq, 1)]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return sorted(t for t, _ in scored[:max_query_terms])


def more_like_this(spark: SparkSession, index_dir, queries: DataFrame,
                   docs: DataFrame, k: int = TOP_K,
                   max_query_terms: int = MLT_MAX_QUERY_TERMS,
                   n_ranges: int | None = None) -> DataFrame:
    """ES ``more_like_this`` over url-identified seed docs: each row of
    ``queries`` is (query_id, like_url); the seed's stored text is
    fetched from ``docs`` (url-pushdown point lookup), its interesting
    terms selected (:func:`mlt_select_terms`), and the selection scored
    as a standard BM25 disjunction through the default engine path —
    with the seed doc itself excluded from the hits (``include: false``,
    the ES default). Returns (query_id, rank, docid, score) re-ranked
    after exclusion."""
    qrows = queries.select("query_id", "like_url").collect()
    meta = _doc_meta(spark, index_dir).select("docid", "url")
    plans, seeds = [], []
    for r in qrows:
        qid, u = int(r["query_id"]), r["like_url"]
        srow = docs.filter(F.col("url") == u).select("text").head(1)
        text = srow[0]["text"] if srow else ""
        terms = mlt_select_terms(spark, index_dir, text or "",
                                 max_query_terms)
        plans.append((qid, " ".join(terms)))
        seeds.append((qid, u))
    qdf = local_df(spark, plans, "query_id long, qtext string")
    seed_df = local_df(spark, seeds, "query_id long, url string")
    seed_ids = (seed_df.join(meta, "url")
                .select("query_id", F.col("docid").alias("seed_docid")))
    # k+1 then exclude-and-rerank: the seed can occupy at most one slot
    top = search_topk(spark, index_dir, qdf, k=k + 1, n_ranges=n_ranges)
    kept = (top.join(F.broadcast(seed_ids), "query_id", "left")
            .filter(F.col("seed_docid").isNull()
                    | (F.col("docid") != F.col("seed_docid")))
            .drop("seed_docid"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (kept.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def search_metric_aggs(spark: SparkSession, index_dir, queries: DataFrame,
                       round_to: int = 9, ts_lo: str | None = None,
                       ts_hi: str | None = None,
                       bucket_regex: str = HOST_RE,
                       matched: DataFrame | None = None,
                       **bool_kwargs) -> DataFrame:
    """ES *metric* aggregations over the match set — one row per query
    carrying the ``stats`` agg on the doc-length field (``min``/``max``/
    ``sum``/``avg`` + ``value_count``), the ``percentiles`` agg (p50 and
    p95, exact linear interpolation — the deterministic analog of ES's
    TDigest, which is itself approximate), and the ``cardinality`` agg
    on the url-derived host key (exact ``count distinct`` — the
    oracle-checkable analog of ES's HLL; the engine's HLL variant is
    A3 ``approx_count_distinct``, rows-only checked).

    ``ts_lo``/``ts_hi`` (timestamp strings) add ES's non-scoring
    ``bool.filter`` range clause on ``warc_ts``: the match set is
    filtered [lo, hi) BEFORE aggregating, scores untouched — exactly
    how a filter clause participates in ES (no score contribution,
    pure selection).

    Plan shape: matched (query_id, docid) equi-joins the doclens sink
    on docid (shuffle join, AQE-eligible), then ONE hash aggregation —
    percentile is a JVM built-in, so the whole agg stays codegen'd.
    Averages/percentiles round to ``round_to`` so a summation-order
    last-ulp can never flip a compared value."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select(
        "docid", "dl", "warc_ts",
        F.regexp_extract("url", bucket_regex, 1).alias("host"))
    j = matched.join(meta, "docid")
    if ts_lo is not None:
        j = j.filter(F.col("warc_ts") >= F.to_timestamp(F.lit(ts_lo)))
    if ts_hi is not None:
        j = j.filter(F.col("warc_ts") < F.to_timestamp(F.lit(ts_hi)))
    return j.groupBy("query_id").agg(
        F.count("*").alias("doc_count"),
        F.min("dl").alias("min_dl"),
        F.max("dl").alias("max_dl"),
        F.sum("dl").alias("sum_dl"),
        F.round(F.avg("dl"), round_to).alias("avg_dl"),
        F.round(F.percentile("dl", F.lit(0.5)), round_to).alias("p50_dl"),
        F.round(F.percentile("dl", F.lit(0.95)), round_to).alias("p95_dl"),
        F.countDistinct("host").alias("host_card"))


def search_boosting(spark: SparkSession, index_dir, queries: DataFrame,
                    negative_boost: float = 0.5, k: int = TOP_K) -> DataFrame:
    """ES ``boosting`` query: the positive query (``qtext``) is scored
    as a normal BM25 disjunction; docs that ALSO match the negative
    query (nullable ``neg_qtext`` column) keep their hit but are
    demoted — ``score × negative_boost`` — never excluded. This is the
    scoring counterpart of ``bool.must_not`` (which excludes): the two
    share the negative-clause analysis but differ in what a negative
    match does.

    Plan shape: two engine match sets (each shuffle-bounded by its own
    query terms' postings) left-joined on (query_id, docid); the
    demotion is one JVM CASE expression; then the standard per-query
    top-k window. Rows with a null ``neg_qtext`` take the plain-BM25
    path unchanged."""
    queries = localize_queries(spark, queries)  # pos + neg + head passes
    pos = search_matches(spark, index_dir,
                         queries.select("query_id", "qtext"))
    nq = (queries.filter(F.col("neg_qtext").isNotNull())
          .select("query_id", F.col("neg_qtext").alias("qtext")))
    if nq.head(1):
        neg = (search_matches(spark, index_dir, nq)
               .select("query_id", "docid")
               .withColumn("__neg", F.lit(True)))
        pos = (pos.join(neg, ["query_id", "docid"], "left")
               .withColumn("score",
                           F.when(F.col("__neg"),
                                  F.col("score")
                                  * F.lit(float(negative_boost)))
                           .otherwise(F.col("score")))
               .drop("__neg"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (pos.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def search_constant_score(spark: SparkSession, index_dir,
                          queries: DataFrame, boost: float = 1.0,
                          k: int = TOP_K, **bool_kwargs) -> DataFrame:
    """ES ``constant_score``: every doc matching the wrapped query
    scores exactly ``boost`` — retrieval without relevance ranking
    (ES uses it to cache pure filters). Ties break docid asc, so the
    top k are the k smallest matching docids — fully deterministic.
    Bool-query kwargs pass through to the match-set seam."""
    matched = (search_matches(spark, index_dir, queries, **bool_kwargs)
               .withColumn("score", F.lit(float(boost))))
    w = Window.partitionBy("query_id").orderBy(F.asc("docid"))
    return (matched.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def search_rescore(spark: SparkSession, index_dir, queries: DataFrame,
                   window_size: int = 50, k: int = TOP_K,
                   query_weight: float = 1.0,
                   rescore_weight: float = 1.0,
                   n_ranges: int | None = None) -> DataFrame:
    """ES ``rescore`` with a ``match_phrase`` secondary — the classic
    precision pass: take the top ``window_size`` hits of the primary
    BM25 disjunction, re-rank ONLY those by
    ``query_weight·bm25 + rescore_weight·phrase_score``, return the
    top ``k``. Docs outside the window keep their fate — exactly ES's
    window semantics (a doc ranked below ``window_size`` can never be
    rescored in).

    ``phrase_score`` here is the engine's match_phrase score: BM25
    over the phrase's distinct terms restricted to phrase-matching
    docs (search.py Q8) — for a phrase built from the SAME qtext that
    equals the primary disjunctive score, so combined =
    ``bm25 · (query_weight + rescore_weight·[phrase matches])``.

    The phrase side runs with ``k=window_size``, which is sufficient,
    not approximate: phrase hits are a subset of disjunctive matches
    and both sides rank by the identical (score desc, docid asc) key,
    so any phrase hit inside the primary window has phrase-rank ≤ its
    primary rank ≤ window_size — no phrase hit that matters can be
    cut. Plan: two engine top-k's + one (query_id, docid) left join +
    one window — no extra decode passes."""
    queries = localize_queries(spark, queries)  # two passes, one collect
    win = search_topk(spark, index_dir, queries, k=window_size,
                      n_ranges=n_ranges)
    ph = (search_phrase(spark, index_dir, queries, k=window_size,
                        n_ranges=n_ranges)
          .select("query_id", "docid",
                  F.col("score").alias("__phscore")))
    comb = (win.join(ph, ["query_id", "docid"], "left")
            .withColumn("score",
                        F.lit(float(query_weight)) * F.col("score")
                        + F.lit(float(rescore_weight))
                        * F.coalesce(F.col("__phscore"), F.lit(0.0)))
            .drop("__phscore"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (comb.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def search_top_hits(spark: SparkSession, index_dir, queries: DataFrame,
                    n_buckets: int = 10, k_hits: int = 3,
                    bucket_regex: str = HOST_RE,
                    round_to: int | None = None,
                    matched: DataFrame | None = None,
                    **bool_kwargs) -> DataFrame:
    """ES ``terms`` agg with a ``top_hits`` sub-agg: the top
    ``n_buckets`` buckets per query by (doc_count desc, bucket asc) —
    the Q17 terms-agg order — and within each kept bucket the top
    ``k_hits`` matching docs by (score desc, docid asc). This is ES's
    "best documents per category" idiom (group hits by host, show the
    3 best per host).

    ``round_to`` ranks hits on ``round(score, round_to)`` — the same
    cross-engine contract as :func:`search_page` — so an FP
    summation-order difference can never flip a within-bucket rank.

    Plan shape: ONE matched-set ⋈ doclens join feeds both the bucket
    counting agg and the per-(query, bucket) hit window; the bucket
    top-N join back is a tiny broadcast (n_queries × n_buckets rows).
    Returns (query_id, bucket, doc_count, brank, hrank, docid,
    score)."""
    if matched is None:
        # materialized once: the bucket-count agg and the hit window
        # both consume the match set (same device as
        # search_significant_terms — lazy it would score twice)
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs).localCheckpoint(eager=True)
    meta = _doc_meta(spark, index_dir).select(
        "docid", F.regexp_extract("url", bucket_regex, 1).alias("bucket"))
    key = (F.round(F.col("score"), round_to) if round_to is not None
           else F.col("score"))
    bk = matched.join(meta, "docid").withColumn("__key", key)
    counts = (bk.groupBy("query_id", "bucket")
              .agg(F.count("*").alias("doc_count")))
    wb = Window.partitionBy("query_id").orderBy(
        F.desc("doc_count"), F.asc("bucket"))
    kept = (counts.withColumn("brank", F.row_number().over(wb).cast("long"))
            .filter(F.col("brank") <= n_buckets))
    wh = Window.partitionBy("query_id", "bucket").orderBy(
        F.desc("__key"), F.asc("docid"))
    hits = (bk.withColumn("hrank", F.row_number().over(wh).cast("long"))
            .filter(F.col("hrank") <= k_hits))
    return (hits.join(F.broadcast(kept), ["query_id", "bucket"])
            .select("query_id", "bucket", "doc_count", "brank", "hrank",
                    "docid", F.col("__key").alias("score")))


def search_histogram(spark: SparkSession, index_dir, queries: DataFrame,
                     interval: int = 25, n_buckets: int = 10000,
                     matched: DataFrame | None = None,
                     **bool_kwargs) -> DataFrame:
    """ES ``aggs: {histogram: {field: dl, interval: N}}`` alongside a
    query: fixed-width numeric buckets over the matched docs' doc
    length — ``key = floor(dl / interval) * interval`` (ES's histogram
    key formula), buckets ordered by KEY ascending, empty buckets
    omitted (``min_doc_count: 1``).

    Plan shape: identical to :func:`search_facets` — the matched set
    equi-joins the doclens sink on docid (shuffle join, AQE-eligible),
    the bucket key is one JVM expression, then a hash agg and a tiny
    per-query window. Returns (query_id, bucket, doc_count, brank)."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select("docid", "dl")
    counts = (matched.join(meta, "docid")
              .withColumn("bucket", (F.floor(F.col("dl") / interval)
                                     * interval).cast("long"))
              .groupBy("query_id", "bucket")
              .agg(F.count("*").alias("doc_count")))
    w = Window.partitionBy("query_id").orderBy(F.asc("bucket"))
    return (counts.withColumn("brank", F.row_number().over(w).cast("long"))
            .filter(F.col("brank") <= n_buckets)
            .select("query_id", "bucket", "doc_count", "brank"))


def search_range_agg(spark: SparkSession, index_dir, queries: DataFrame,
                     ranges: list, matched: DataFrame | None = None,
                     **bool_kwargs) -> DataFrame:
    """ES ``aggs: {range: {field: dl, ranges: [...]}}``: each range is
    ``(key, lo, hi)`` with ``from`` INCLUSIVE, ``to`` EXCLUSIVE and
    ``None`` for an open end — ES's exact range-agg bounds. EVERY
    declared range comes back (ES returns empty buckets for the range
    agg — unlike terms/histogram there is no ``min_doc_count`` cut),
    ``brank`` = the declaration position, for every query in the input
    (a query with zero matches still reports all its ranges at 0).

    Plan shape: the ranges list is tiny and broadcast — the theta join
    against the matched⋈doclens rows is a BroadcastNestedLoopJoin over
    |ranges| rows (ranges may overlap, as in ES, so this is NOT an
    equi-join); the zero-fill grid is |queries|×|ranges|, also
    broadcast. Nothing here grows with the corpus except the matched
    set itself."""
    rows = [(i + 1, key,
             float(lo) if lo is not None else None,
             float(hi) if hi is not None else None)
            for i, (key, lo, hi) in enumerate(ranges)]
    rdf = local_df(
        spark, rows, "brank long, bucket string, lo double, hi double")
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select("docid", "dl")
    j = matched.join(meta, "docid")
    cond = ((F.col("lo").isNull() | (F.col("dl") >= F.col("lo")))
            & (F.col("hi").isNull() | (F.col("dl") < F.col("hi"))))
    counts = (j.join(F.broadcast(rdf), cond)
              .groupBy("query_id", "brank", "bucket")
              .agg(F.count("*").alias("doc_count")))
    grid = (queries.select("query_id").distinct()
            .crossJoin(F.broadcast(rdf.select("brank", "bucket"))))
    return (grid.join(counts, ["query_id", "brank", "bucket"], "left")
            .select("query_id", "bucket",
                    F.coalesce("doc_count", F.lit(0)).cast("long")
                    .alias("doc_count"),
                    "brank"))


def search_filters_agg(spark: SparkSession, index_dir, queries: DataFrame,
                       filters: dict, matched: DataFrame | None = None,
                       **bool_kwargs) -> DataFrame:
    """ES keyed ``filters`` agg: named sub-buckets, each counting the
    matched docs satisfying its predicate — a SQL expression over the
    doc-meta columns (docid, url, dl, warc_ts). Every named bucket is
    returned (count 0 included — ES keyed-filters semantics), ``brank``
    = declaration order.

    Plan shape: ONE hash aggregation — each filter becomes a
    ``sum(CASE WHEN … )`` column in the same codegen'd agg (no
    per-filter pass over the match set), then a driver-free unpivot to
    (bucket, doc_count) rows and a zero-fill left join from the query
    list."""
    names = list(filters)
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir)
    j = matched.join(meta, "docid")
    agg = j.groupBy("query_id").agg(*[
        F.sum(F.when(F.expr(filters[n]), 1).otherwise(0)).cast("long")
        .alias(f"__f{i}") for i, n in enumerate(names)])
    grid = queries.select("query_id").distinct()
    agg = grid.join(agg, "query_id", "left")
    stacked = agg.unpivot(
        ["query_id"], [f"__f{i}" for i in range(len(names))],
        "fidx", "doc_count")
    bucket = F.coalesce(*[F.when(F.col("fidx") == f"__f{i}", F.lit(n))
                          for i, n in enumerate(names)])
    brank = F.coalesce(*[F.when(F.col("fidx") == f"__f{i}", F.lit(i + 1))
                         for i in range(len(names))]).cast("long")
    return stacked.select(
        "query_id", bucket.alias("bucket"),
        F.coalesce(F.col("doc_count"), F.lit(0)).cast("long")
        .alias("doc_count"),
        brank.alias("brank"))


def search_composite(spark: SparkSession, index_dir, queries: DataFrame,
                     page_size: int = 10, after: DataFrame | None = None,
                     bucket_regex: str = HOST_RE, interval: int = 25,
                     matched: DataFrame | None = None,
                     **bool_kwargs) -> DataFrame:
    """ES ``composite`` agg over two sources — a url-derived terms
    source (``bucket_regex`` group 1) and a dl histogram source —
    paging bucket TUPLES in composite-key order (k1 asc, k2 asc) with
    an ``after`` keyset cursor, exactly ES's scalable
    "stream every bucket out" API (the agg counterpart of Q19
    ``search_after``: deep pages never recount earlier buckets).

    ``after`` is (query_id, after_k1, after_k2) — the composite key of
    the previous page's LAST bucket; queries without a cursor row
    start at the first bucket. Both keys are integers/strings, so
    the cursor comparison is exact across engines (no FP).

    Plan shape: one matched⋈doclens join, one hash agg on (query_id,
    k1, k2), the broadcast cursor filter BEFORE the per-query window —
    the window ranks only buckets past the cursor. Returns
    (query_id, k1, k2, doc_count, brank)."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select(
        "docid",
        F.regexp_extract("url", bucket_regex, 1).alias("k1"),
        (F.floor(F.col("dl") / interval) * interval).cast("long")
        .alias("k2"))
    counts = (matched.join(meta, "docid")
              .groupBy("query_id", "k1", "k2")
              .agg(F.count("*").alias("doc_count")))
    if after is not None:
        counts = (counts.join(F.broadcast(after), "query_id", "left")
                  .filter(F.col("after_k1").isNull()
                          | (F.col("k1") > F.col("after_k1"))
                          | ((F.col("k1") == F.col("after_k1"))
                             & (F.col("k2") > F.col("after_k2"))))
                  .drop("after_k1", "after_k2"))
    w = Window.partitionBy("query_id").orderBy(F.asc("k1"), F.asc("k2"))
    return (counts.withColumn("brank", F.row_number().over(w).cast("long"))
            .filter(F.col("brank") <= page_size)
            .select("query_id", "k1", "k2", "doc_count", "brank"))


def search_pipeline_aggs(spark: SparkSession, index_dir,
                         queries: DataFrame, interval: str = "minute",
                         top_n: int | None = None,
                         matched: DataFrame | None = None,
                         **bool_kwargs) -> DataFrame:
    """ES *pipeline* aggregations over a date_histogram parent: for
    each calendar bucket of the matched docs, ``cumulative_sum`` of
    doc_count (running total across key-asc buckets), ``derivative``
    (doc_count minus the previous bucket's; the first bucket — where
    ES omits the derivative key entirely — reports 0, a deterministic
    NULL-free sentinel for the same fact), and ``bucket_sort`` by
    (doc_count desc, bucket asc) truncated to ``top_n`` buckets
    (``None`` keeps all). ``brank`` is the key-asc position the
    pipeline aggs are defined over, ``srank`` the bucket_sort rank.

    Plan shape: the Q22 date-histogram agg (matched ⋈ doclens → hash
    agg) followed by per-query windows over the BUCKET rows — a few
    hundred rows per query, trivially small whatever the corpus size;
    pipeline aggs in ES likewise run on the reduced buckets, never the
    documents."""
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir).select(
        "docid",
        F.date_format(F.date_trunc(interval, "warc_ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("bucket"))
    counts = (matched.join(meta, "docid")
              .groupBy("query_id", "bucket")
              .agg(F.count("*").alias("doc_count")))
    wk = Window.partitionBy("query_id").orderBy(F.asc("bucket"))
    wcum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("doc_count"), F.asc("bucket"))
    res = (counts
           .withColumn("cum_sum", F.sum("doc_count").over(wcum)
                       .cast("long"))
           .withColumn("deriv", F.coalesce(
               F.col("doc_count") - F.lag("doc_count", 1).over(wk),
               F.lit(0)).cast("long"))
           .withColumn("brank", F.row_number().over(wk).cast("long"))
           .withColumn("srank", F.row_number().over(ws).cast("long")))
    if top_n is not None:
        res = res.filter(F.col("srank") <= top_n)
    return res.select("query_id", "bucket", "doc_count", "cum_sum",
                      "deriv", "brank", "srank")


def search_collapse(spark: SparkSession, index_dir, queries: DataFrame,
                    k: int = TOP_K, inner_k: int = 3,
                    collapse_regex: str = HOST_RE,
                    round_to: int | None = None,
                    matched: DataFrame | None = None,
                    **bool_kwargs) -> DataFrame:
    """ES field ``collapse`` + ``inner_hits``: the result list is
    deduplicated to ONE representative hit per collapse key (the
    group's best hit by the sort key), the top ``k`` groups are
    returned ordered by their representative's key — ES collapse
    semantics: a strong group can hide weaker docs of the same key,
    and the k results are k DISTINCT keys — and each returned group
    carries its top ``inner_k`` member hits (``inner_hits``), ranked
    within the group.

    ``round_to`` ranks on the rounded score (the Q19 cross-engine
    contract). Plan shape: matched ⋈ doclens, ONE per-(query, key)
    window for both the representative choice and the inner-hit ranks,
    a per-query window over the representatives only (one row per
    group — already reduced), and a tiny broadcast join back. Returns
    (query_id, rank, ckey, hrank, docid, score): rank = the group's
    position, hrank = the hit's rank inside its group (hrank 1 IS the
    representative)."""
    if matched is None:
        # materialized once: the group-representative window and the
        # inner-hits filter both consume the match set (same device as
        # search_significant_terms — lazy it would score twice)
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs).localCheckpoint(eager=True)
    meta = _doc_meta(spark, index_dir).select(
        "docid", F.regexp_extract("url", collapse_regex, 1).alias("ckey"))
    key = (F.round(F.col("score"), round_to) if round_to is not None
           else F.col("score"))
    j = matched.join(meta, "docid").withColumn("__key", key)
    wg = Window.partitionBy("query_id", "ckey").orderBy(
        F.desc("__key"), F.asc("docid"))
    hits = j.withColumn("hrank", F.row_number().over(wg).cast("long"))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("__key"), F.asc("docid"))
    groups = (hits.filter(F.col("hrank") == 1)
              .withColumn("rank", F.row_number().over(wq).cast("long"))
              .filter(F.col("rank") <= k)
              .select("query_id", "ckey", "rank"))
    return (hits.filter(F.col("hrank") <= inner_k)
            .join(F.broadcast(groups), ["query_id", "ckey"])
            .select("query_id", "rank", "ckey", "hrank", "docid",
                    F.col("__key").alias("score")))


def search_explain(spark: SparkSession, index_dir, queries: DataFrame,
                   docs: DataFrame, k: int = TOP_K, round_to: int = 9,
                   rank_round_to: int | None = None,
                   n_ranges: int | None = None) -> DataFrame:
    """ES ``explain: true`` analog: for each top-``k`` hit, the
    per-term BM25 score breakdown ES prints — tf, df, the idf term,
    the tf norm, and the term's contribution — recomputed from the
    engine's OWN artifacts: df from the dictionary sink (``term IN``
    pushdown, summed across a chain), dl from the doclens sink,
    N/avgdl from the stats sink, per-hit tf by re-analyzing the hit's
    stored text (the same field-data path the highlighter and
    significant_terms use; tokenize = the frozen T(text) as built-in
    column functions). Only matching terms appear — exactly the leaf
    details ES's explanation tree carries for a sum-of-clauses query.

    The contribution uses the scoring formula's exact parenthesization
    ``idf · tf / (tf + k1·(1-b+b·dl/avgdl))`` so the value is
    bit-reproducible by any engine evaluating the same expression;
    ``round_to`` rounds the reported components, ``rank_round_to``
    ranks hits on the rounded retrieval score (the Q19 cross-engine
    contract). The full-precision contributions sum back to the hit's
    retrieval score (pytest-pinned).

    Plan shape: top-k retrieval, then k·|queries| hit rows join docs
    and explode to matched tokens only (an equi-join against the
    analyzed query terms prunes the token stream before the tf agg);
    the dictionary lookup is a pushed point scan. Returns (query_id,
    rank, docid, term, tf, df, idf_r, tfn_r, contrib_r, score_r)."""
    from ..config import B, K1
    from .search import (_QueryAnalysis, _chain_stats, _global_df_map,
                         candidate_segments)
    queries = localize_queries(spark, queries)  # top-k + analysis passes
    top = search_topk(spark, index_dir, queries, k=k, n_ranges=n_ranges)
    if rank_round_to is not None:
        w0 = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", rank_round_to)), F.asc("docid"))
        top = top.withColumn("rank", F.row_number().over(w0))
    dirs = _as_dirs(index_dir)
    # tombstone-corrected stats (N_eff, avgdl_eff, df_eff), the SAME
    # values the retrieval path scores with — explain contributions
    # must sum back to the retrieval score on re-crawl chains too
    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    qa = _QueryAnalysis(spark, queries)
    qterms = qa.qterms_df()
    terms = qa.terms
    if dead.size:
        seg = candidate_segments(spark, index_dir, terms)
        dfm = _global_df_map(spark, index_dir, terms, seg=seg, dead=dead)
        dfs = local_df(
            spark,
            [(t, int(v)) for t, v in sorted(dfm.items())],
            "term string, df long")
    else:
        dfs = None
        for d in dirs:
            piece = (read_dictionary(spark, d)
                     .select("term", "df").filter(F.col("term").isin(terms)))
            dfs = piece if dfs is None else dfs.unionByName(piece)
        dfs = dfs.groupBy("term").agg(F.sum("df").cast("long").alias("df"))
    meta = _doc_meta(spark, index_dir).select("docid", "url", "dl")
    hit = (top.join(meta, "docid")
           .join(docs.select("url", "text"), "url"))
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: (t != F.lit("")) & (F.length(t) <= F.lit(64)))
    tf = (hit.withColumn("term", F.explode(toks))
          .join(F.broadcast(qterms), ["query_id", "term"])
          .groupBy("query_id", "rank", "docid", "score", "dl", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    ex = tf.join(F.broadcast(dfs), "term")
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf")
             + F.lit(K1) * (F.lit(1.0 - B)
                            + F.lit(B) * F.col("dl") / F.lit(avgdl)))
    return ex.select(
        "query_id", "rank", "docid", "term", "tf", "df",
        F.round(idf, round_to).alias("idf_r"),
        F.round(F.col("tf") / denom, round_to).alias("tfn_r"),
        F.round(idf * F.col("tf") / denom, round_to).alias("contrib_r"),
        F.round("score", 6).alias("score_r"))


def suggest_phrases(spark: SparkSession, index_dir, phrases: DataFrame,
                    max_edits: int = 1, per_word: int = 3,
                    n_suggestions: int = 3) -> DataFrame:
    """ES *phrase suggester* analog ("did you mean" for whole queries):
    per-word candidates come from the term-suggester kernel
    (:func:`suggest_terms`, ``always`` mode — Levenshtein ≤
    ``max_edits``, ranked distance asc / df desc / term asc, capped at
    ``per_word``; the word itself rides along at edit 0), the bounded
    cartesian combinations are scored by REAL index evidence — the
    number of documents matching the WHOLE candidate phrase
    conjunctively, through the engine's own bool.must path
    (``search_taat(require_all=True)``) — and ranked (doc_count desc,
    total edits asc, suggestion asc), top ``n_suggestions`` per
    phrase. Combos equal to the input are excluded (ES suggests only
    corrections) and combos with ZERO conjunctive matches are dropped
    — the deterministic analog of ES's real-word confidence cutoff
    (its smoothed-LM score likewise favors collocations the index has
    actually seen).

    Plan shape: candidate generation is one Q23 dictionary scan for
    ALL distinct words; evidence is ONE engine query batch (every
    combo a query row — the shuffle is bounded by the candidate
    terms' postings, the same bound as scored retrieval); ranking is
    a tiny per-phrase window. Driver-side work is only the
    human-scale combo assembly. Returns (phrase_id, phrase, srank,
    suggestion, edits, doc_count)."""
    from itertools import product

    from .search import search_taat
    out_schema = ("phrase_id long, phrase string, srank long, "
                  "suggestion string, edits long, doc_count long")
    rows = phrases.select("phrase_id", "phrase").collect()
    words = sorted({w for r in rows for w in tokenize(r["phrase"])})
    if not words:
        return spark.createDataFrame([], out_schema)
    wdf = local_df(spark, list(enumerate(words)),
                   "word_id long, word string")
    cand_rows = suggest_terms(spark, index_dir, wdf, max_edits=max_edits,
                              n_suggestions=per_word,
                              suggest_mode="always").collect()
    cands: dict[str, list[tuple[str, int]]] = {}
    for r in cand_rows:
        cands.setdefault(r["word"], []).append((r["term"],
                                                int(r["distance"])))
    meta, combo_id = [], 0
    for r in rows:
        pid, toks = int(r["phrase_id"]), tokenize(r["phrase"])
        original = " ".join(toks)
        per = [[(w, 0)] + sorted(cands.get(w, [])) for w in toks]
        for pick in product(*per):
            sug = " ".join(t for t, _ in pick)
            if sug == original:
                continue
            meta.append((combo_id, pid, original, sug,
                         sum(e for _, e in pick)))
            combo_id += 1
    if not meta:
        return spark.createDataFrame([], out_schema)
    qdf = local_df(spark, [(cid, s) for cid, _, _, s, _ in meta],
                   "query_id long, qtext string")
    counts = (search_taat(spark, index_dir, qdf, require_all=True,
                          return_matches=True)
              .groupBy("query_id")
              .agg(F.count("*").cast("long").alias("doc_count")))
    mdf = local_df(
        spark, meta, "query_id long, phrase_id long, phrase string, "
                     "suggestion string, edits long")
    win = Window.partitionBy("phrase_id").orderBy(
        F.desc("doc_count"), F.asc("edits"), F.asc("suggestion"))
    return (mdf.join(counts, "query_id")   # inner: zero-evidence combos drop
            .withColumn("srank", F.row_number().over(win).cast("long"))
            .filter(F.col("srank") <= n_suggestions)
            .select("phrase_id", "phrase", "srank", "suggestion",
                    "edits", "doc_count"))


# registered-set size above which percolate switches from the
# broadcast nested-loop plan (predicate cost O(|registered|) PER DOC)
# to term→query candidate pre-selection (cost O(doc's distinct tokens)
# per doc — the ES percolator-index shape). Env-overridable.
PERCOLATE_PRESELECT_MIN = int(
    _os.environ.get("AARHUS_PERCOLATE_PRESELECT_MIN", 4096))


def percolate(spark: SparkSession, queries: DataFrame,
              docs: DataFrame,
              candidate_preselect: bool | None = None) -> DataFrame:
    """ES *percolate* query — reverse search: match INCOMING documents
    against a set of REGISTERED queries at ingest time (alerting /
    saved-search routing), before anything reaches the index. Each
    registered query row is (query_id, qtext, kind, msm):

    - ``kind='must'`` — the doc must contain EVERY analyzed term
      (bool.must; a query term the doc lacks fails it);
    - ``kind='msm'`` — at least ``msm`` distinct analyzed terms
      (bool.should + minimum_should_match);
    - ``kind='phrase'`` — the exact analyzed token sequence occurs
      (match_phrase, slop 0).

    Returns (url, query_id, kind) — one row per (document, matching
    registered query).

    Plan shape — the part that matters at 10^12 docs/day ingest: the
    registered query set is broadcast and there is NO Exchange
    anywhere in the plan (plan-asserted, tests/test_plans.py) — both
    forms are column predicates under one broadcast nested-loop each.
    Term kinds: both sides' token sets are plain column expressions
    (the frozen JVM tokenizer), the predicate is
    ``size(array_intersect(doc_tokens, query_terms)) >= needed`` with
    ``needed = |query terms|`` for must and ``msm`` for msm — no
    explode, no aggregation, no shuffle. Phrase kind: the doc's
    normalized token stream is space-joined once and the test is a
    guarded-substring predicate (tokens are [a-z0-9]+ joined by single
    spaces, so ``' p1 p2 '`` substring-matches exactly the token
    subsequence). ES pays the same shape: every doc is tested against
    every registered query's memory-resident form; candidate
    pre-selection (ES's internal percolator index) is an optimization
    over the same contract, not a different answer."""
    # validate the registered set up front (it is broadcast-scale by
    # contract, so a driver check costs nothing): a must/phrase query
    # whose qtext analyzes to ZERO terms would yield qarr=[] and
    # need=0, silently matching EVERY incoming document; an msm query
    # with a null or < 1 msm silently matches nothing. Raise instead,
    # matching the other operators' validation style.
    qv = queries.select("query_id", "kind", "msm", "qtext").toPandas()
    for qid_, kind_, msm_, qtext_ in zip(qv["query_id"], qv["kind"],
                                         qv["msm"], qv["qtext"]):
        if kind_ in ("must", "phrase", "msm") and not tokenize(qtext_ or ""):
            raise ValueError(
                f"registered percolate query {qid_} ({kind_}) analyzes "
                f"to zero terms: {qtext_!r} — it would match every "
                f"(must/phrase) or no (msm) incoming document")
        if kind_ == "msm" and (msm_ is None or int(msm_) < 1):
            raise ValueError(
                f"registered percolate query {qid_} needs msm >= 1, "
                f"got {msm_!r}")

    if candidate_preselect is None:
        candidate_preselect = len(qv) >= PERCOLATE_PRESELECT_MIN
    if candidate_preselect:
        return _percolate_preselect(spark, qv, docs)

    def _tok(col):
        return F.filter(
            F.split(F.lower(col), "[^a-z0-9]+"),
            lambda t: (t != F.lit("")) & (F.length(t) <= F.lit(64)))

    d = docs.select("url", F.array_distinct(_tok(F.col("text")))
                    .alias("tarr"),
                    F.concat(F.lit(" "),
                             F.concat_ws(" ", _tok(F.col("text"))),
                             F.lit(" ")).alias("hay"))

    term_q = (queries.filter(F.col("kind").isin("must", "msm"))
              .select("query_id", "kind", "msm",
                      F.array_distinct(_tok(F.col("qtext")))
                      .alias("qarr")))
    need = (F.when(F.col("kind") == "must", F.size("qarr"))
            .otherwise(F.col("msm")))
    term_hits = (d.join(
        F.broadcast(term_q),
        F.size(F.array_intersect(F.col("tarr"), F.col("qarr"))) >= need)
        .select("url", "query_id", "kind"))

    phrase_q = (queries.filter(F.col("kind") == "phrase")
                .select("query_id", "kind",
                        F.concat(F.lit(" "),
                                 F.concat_ws(" ", _tok(F.col("qtext"))),
                                 F.lit(" ")).alias("needle")))
    phrase_hits = (d.join(
        F.broadcast(phrase_q), F.col("hay").contains(F.col("needle")))
        .select("url", "query_id", "kind"))
    return term_hits.unionByName(phrase_hits)


def _percolate_preselect(spark: SparkSession, qv, docs: DataFrame) -> DataFrame:
    """Candidate pre-selection percolator — the ES percolator-index
    shape for LARGE registered sets (round-7 verdict item 4).

    The broadcast nested-loop plan evaluates every registered predicate
    against every incoming doc: O(|registered|) work per doc, fine for
    thousands of saved searches, a scale wall at 10^5+. This path
    builds a term → [query] inverted map over the registered queries'
    analyzed terms (driver-side — the registered set is the same
    broadcast-scale object the BNL path ships), broadcasts it, and for
    each incoming doc counts per-query matched DISTINCT terms via map
    lookups on the doc's distinct tokens only — O(distinct tokens) per
    doc regardless of |registered|. The exact predicates then run on
    the shortlist alone:

    - must: matched-distinct-count == |analyzed terms| IS the predicate;
    - msm: matched-distinct-count >= msm IS the predicate;
    - phrase: all-terms-present is the necessary pre-filter; the exact
      guarded-substring test (' needle ' in ' hay ') runs per surviving
      (doc, query) pair only.

    Bit-identical matches to the broadcast plan (pytest-pinned): the
    tokenizer is the same frozen analyzer, and each predicate above is
    algebraically the BNL column predicate. Docs never shuffle — ONE
    mapInPandas pass over (url, text), no Exchange on the doc side at
    all (the output is the match rows themselves)."""
    import numpy as np

    term_to_q: dict[str, list] = {}
    qmeta: dict[int, tuple] = {}   # qid -> (kind, need, needle|None)
    for qid_, kind_, msm_, qtext_ in zip(qv["query_id"], qv["kind"],
                                         qv["msm"], qv["qtext"]):
        qid_ = int(qid_)
        toks = tokenize(qtext_ or "")
        uniq = sorted(set(toks))
        if kind_ == "must":
            need = len(uniq)
        elif kind_ == "msm":
            need = int(msm_)
        elif kind_ == "phrase":
            need = len(uniq)
        else:
            continue    # unknown kinds contribute nothing (BNL parity)
        needle = " " + " ".join(toks) + " " if kind_ == "phrase" else None
        qmeta[qid_] = (str(kind_), need, needle)
        for t in uniq:
            term_to_q.setdefault(t, []).append(qid_)
    b = spark.sparkContext.broadcast((term_to_q, qmeta))

    def match(batches):
        t2q, meta = b.value
        for pdf in batches:
            out_url, out_qid, out_kind = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                toks = tokenize(text or "")
                counts: dict[int, int] = {}
                for t in set(toks):
                    for qid in t2q.get(t, ()):
                        counts[qid] = counts.get(qid, 0) + 1
                if not counts:
                    continue
                hay = None
                for qid, c in counts.items():
                    kind, need, needle = meta[qid]
                    if c < need:
                        continue
                    if needle is not None:
                        if hay is None:
                            hay = " " + " ".join(toks) + " "
                        if needle not in hay:
                            continue
                    out_url.append(url)
                    out_qid.append(qid)
                    out_kind.append(kind)
            if out_url:
                yield pd.DataFrame({"url": out_url,
                                    "query_id": np.asarray(out_qid, np.int64),
                                    "kind": out_kind})

    return docs.select("url", "text").mapInPandas(
        match, schema="url string, query_id long, kind string")


def search_adjacency_matrix(spark: SparkSession, index_dir,
                            queries: DataFrame, filters: dict,
                            matched: DataFrame | None = None,
                            **bool_kwargs) -> DataFrame:
    """ES ``adjacency_matrix`` agg: named filters A, B, … produce a
    bucket per filter AND per pairwise intersection (ES key format
    ``A&B``, the declared ``&`` separator), each counting the matched
    docs satisfying the conjunction; empty buckets are omitted (ES
    behavior) and buckets order key-asc per query. Predicates are SQL
    expressions over the doc-meta columns, like :func:`search_filters_agg`.

    Plan shape: ONE codegen'd hash aggregation — every single and pair
    key is a ``sum(CASE WHEN pa AND pb)`` column of the same agg over
    the matched⋈doclens rows (n(n+1)/2 columns for n filters — ES
    documents the same quadratic growth and caps n at 100), then a
    driver-free unpivot. Returns (query_id, bucket, doc_count,
    brank)."""
    names = list(filters)
    keys = [(names[i], names[j]) for i in range(len(names))
            for j in range(i, len(names))]
    if matched is None:
        matched = search_matches(spark, index_dir, queries,
                                 **bool_kwargs)
    meta = _doc_meta(spark, index_dir)
    j = matched.join(meta, "docid")
    cols = []
    for k, (a, b) in enumerate(keys):
        pred = (F.expr(filters[a]) if a == b
                else (F.expr(filters[a]) & F.expr(filters[b])))
        cols.append(F.sum(F.when(pred, 1).otherwise(0)).cast("long")
                    .alias(f"__p{k}"))
    agg = j.groupBy("query_id").agg(*cols)
    stacked = agg.unpivot(["query_id"],
                          [f"__p{k}" for k in range(len(keys))],
                          "pidx", "doc_count")
    bucket = F.coalesce(*[
        F.when(F.col("pidx") == f"__p{k}",
               F.lit(a if a == b else f"{a}&{b}"))
        for k, (a, b) in enumerate(keys)])
    w = Window.partitionBy("query_id").orderBy(F.asc("bucket"))
    return (stacked.select("query_id", bucket.alias("bucket"),
                           F.col("doc_count").cast("long")
                           .alias("doc_count"))
            .filter(F.col("doc_count") > 0)
            .withColumn("brank", F.row_number().over(w).cast("long"))
            .select("query_id", "bucket", "doc_count", "brank"))


def global_metric_aggs(spark: SparkSession, index_dir,
                       queries: DataFrame, round_to: int = 9,
                       bucket_regex: str = HOST_RE) -> DataFrame:
    """ES ``global`` agg: metric aggregations computed over the WHOLE
    corpus, ignoring the query — ES attaches the same global row to
    every response, so one row per query_id is returned with the Q25
    metric columns computed over ALL live docs (the doclens sink
    directly; no match set is ever built).

    Plan shape: one hash agg over doclens to a SINGLE row, then a tiny
    broadcast cross join against the query ids."""
    meta = _doc_meta(spark, index_dir).select(
        "docid", "dl",
        F.regexp_extract("url", bucket_regex, 1).alias("host"))
    g = meta.agg(
        F.count("*").alias("doc_count"),
        F.min("dl").alias("min_dl"),
        F.max("dl").alias("max_dl"),
        F.sum("dl").alias("sum_dl"),
        F.round(F.avg("dl"), round_to).alias("avg_dl"),
        F.round(F.percentile("dl", F.lit(0.5)), round_to).alias("p50_dl"),
        F.round(F.percentile("dl", F.lit(0.95)), round_to).alias("p95_dl"),
        F.countDistinct("host").alias("host_card"))
    return queries.select("query_id").distinct().crossJoin(F.broadcast(g))
