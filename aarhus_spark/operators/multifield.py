"""Multi-field indexing + ES ``multi_match`` retrieval.

Reference parity: aarhus's real documents are multi-field emails
(from/to/subject/body) indexed into Elasticsearch, where a query
searches several fields at once and combines per-field BM25 scores —
``best_fields`` (dis-max: the best single field wins, optionally
blended with a ``tie_breaker``) or ``most_fields`` (sum) [PK — ES
multi_match]. SURVEY §2 Q11.

Spark-first design: one standard single-field index PER FIELD under
``out_root/field=<name>/``, all sharing ONE docid space — the corpus
membership and the url→docid map are decided once, on the canonical
``text`` field (frozen P2-P4 prepare semantics), and every field index
is built over exactly that document set.  Fields that are empty for a
document are indexed as a zero-token placeholder so the document keeps
its docid everywhere (dl=0 ⇒ it simply never matches in that field —
ES's behaviour for a missing field).  This reuses the entire existing
build/search stack unchanged: per-field df/avgdl/N statistics fall out
of each field's own index, exactly like Lucene's per-field postings.

Query side: per-field exact disjunctive BM25 (the TAAT path,
deterministic sorted fold) without top-k truncation, then one
hash-aggregation per (query, doc) combining per-field scores with a
deterministic field-sorted fold. The combination is EXACT (not a
rescoring of per-field top-k). Scale: per-field scoring is the same
O(query-term postings) stream the single-field engine ships; the
combine step is one extra shuffle keyed (query_id, docid) over docs
matching ≥1 field — the same key the per-field aggregation already
produced, so AQE coalesces it; a WAND-style upper-bound prune across
fields is the known follow-up, not a blocker (ES block-max applies
per field the same way).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# a single control char: passes the non-empty corpus guard, tokenizes
# to ZERO terms (the tokenizer only emits [a-z0-9]+ runs) — the
# "missing field" placeholder that keeps docid spaces aligned
EMPTY_FIELD_SENTINEL = "\x01"

MULTIFIELD_MANIFEST = "multifield.json"


def _field_dir(out_root: str, name: str) -> str:
    return os.path.join(out_root, f"field={name}")


def build_field_indexes(spark: SparkSession, pages: DataFrame,
                        out_root: str, fields: dict[str, Column],
                        **build_kw) -> dict:
    """Build one inverted index per field over a SHARED docid space.

    ``fields`` maps field name → Column expression producing that
    field's text from the canonical page row (columns: url, warc_ts,
    html, text, lang — ``text`` already extracted/deduped).  The first
    step applies the frozen P2-P4 prepare ONCE (lang filter, E(html)
    where text is null, empty-text guard, dedup-by-url latest-wins) so
    every field sees the same winning row per url; per-field builds
    then substitute the field expression as the page text (empty →
    :data:`EMPTY_FIELD_SENTINEL`, which indexes as dl=0) and run the
    standard :func:`~aarhus_spark.operators.build.build_index`.  Docids
    are assigned by lexicographic url order over identical url sets,
    so the per-field maps are identical by construction (asserted
    cheaply here via N).
    """
    from pyspark.sql.window import Window

    from ..textops import extract_series
    from .build import build_index

    import pyspark.sql.types as T

    @F.pandas_udf(T.StringType())
    def extract_udf(html: pd.Series) -> pd.Series:
        return extract_series(html)

    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"),
                                          F.desc_nulls_last("text"))
    base = (
        pages
        .filter(F.col("lang") == "en")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1).drop("rn")
        .withColumn("text", F.when(F.col("text").isNull(),
                                   extract_udf(F.col("html")))
                    .otherwise(F.col("text")))
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
    )
    from pyspark import StorageLevel
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    stats: dict[str, dict] = {}
    try:
        for name, expr in fields.items():
            fpages = base.select(
                "url", "warc_ts",
                F.lit(None).cast("binary").alias("html"),
                F.coalesce(F.nullif(expr, F.lit("")),
                           F.lit(EMPTY_FIELD_SENTINEL)).alias("text"),
                F.lit("en").alias("lang"))
            stats[name] = build_index(spark, fpages,
                                      _field_dir(out_root, name), **build_kw)
        ns = {name: s["N"] for name, s in stats.items()}
        if len(set(ns.values())) > 1:   # pragma: no cover — by construction
            raise AssertionError(f"field corpora diverged: {ns}")
        with open(os.path.join(out_root, MULTIFIELD_MANIFEST), "w") as f:
            json.dump({"fields": list(fields), "N": next(iter(ns.values()))}, f)
    finally:
        base.unpersist()
    return stats


def list_fields(out_root: str) -> list[str]:
    with open(os.path.join(out_root, MULTIFIELD_MANIFEST)) as f:
        return json.load(f)["fields"]


# pruned top-k dispatch threshold. OPT-IN by default (effectively
# infinite): the round-8 measurements found the exhaustive combiner
# still faster at 200k AND 900k docs on the harness field shape —
# the 40-char title field puts thousands of docs into single
# (tf, dl) score classes, block-max bounds degenerate under those
# ties, and the per-field WAND top-k' passes stop pruning (see
# OPTIMIZATION_r08.md §7 for the walls). The pruned path stays
# available (prune=True / this env knob) for corpora whose fields
# have discriminative score distributions; it is bit-identical
# (pytest-pinned incl. a tie-heavy fixture).
import os as _os

MULTI_MATCH_PRUNE_MIN_DOCS = int(
    _os.environ.get("AARHUS_MM_PRUNE_MIN_DOCS", 1 << 62))


def search_multi_match(spark: SparkSession, index_root: str,
                       queries: DataFrame, k: int = 10,
                       fields: list[str] | None = None,
                       boosts: dict[str, float] | None = None,
                       mode: str = "best_fields",
                       tie_breaker: float = 0.0,
                       prune: bool | None = None) -> DataFrame:
    """ES ``multi_match`` top-k over a multi-field index.

    ``best_fields``: score = max over fields + tie_breaker · (sum of
    the other fields) — ES dis_max with tie_breaker (default 0.0 ⇒
    pure max). ``most_fields``: score = sum over fields. Per-field
    boosts multiply that field's BM25 score (ES ``fields=["f^2"]``).

    Exact, not a rescoring — on BOTH paths. ``prune=None`` dispatches
    on corpus size (like search_topk's fan-out dispatch):

    - exhaustive (small index / forced ``prune=False``): every (query,
      doc, field) BM25 score is the full TAAT value and the cross-field
      fold runs over a field-name-sorted struct array, so FP summation
      order is deterministic (same device as the per-field term fold).
    - pruned (large index / forced ``prune=True``): Fagin-style
      threshold algorithm over the per-field block-max WAND engines —
      per-field exact top-k' (WAND never materializes the match set),
      combined-score upper bound τ for every UNSEEN doc from the
      per-field k'-th scores, exact re-score of the candidate union
      via a candidate-restricted TAAT decode (rows pruned BEFORE the
      shuffle), and k' escalation until ≥ k candidates beat τ
      strictly or every field is exhausted. Scores are bit-identical
      to the exhaustive path: per-field scores come from the same
      TAAT fold restricted to candidates (restriction does not change
      a surviving pair's fold entries), and the cross-field combine
      runs in the same field-name-sorted order (pytest-pinned
      pruned ≡ exhaustive).
    """
    if mode not in ("best_fields", "most_fields"):
        raise ValueError(f"unknown multi_match mode: {mode!r}")
    fields = fields or list_fields(index_root)
    boosts = boosts or {}
    if prune is None:
        with open(os.path.join(index_root, MULTIFIELD_MANIFEST)) as f:
            n_docs = json.load(f).get("N", 0)
        prune = (n_docs >= MULTI_MATCH_PRUNE_MIN_DOCS
                 and 0.0 <= tie_breaker <= 1.0
                 and all(float(b) >= 0.0 for b in boosts.values()))
    if prune:
        return _multi_match_pruned(spark, index_root, queries, k, fields,
                                   boosts, mode, tie_breaker)
    return _multi_match_exhaustive(spark, index_root, queries, k, fields,
                                   boosts, mode, tie_breaker)


def _multi_match_exhaustive(spark: SparkSession, index_root: str,
                            queries: DataFrame, k: int,
                            fields: list[str], boosts: dict[str, float],
                            mode: str, tie_breaker: float) -> DataFrame:
    """The full-materialization combiner (docstring contract above) —
    the bit-equality twin of the pruned path."""
    from pyspark.sql.window import Window

    from .search import search_taat

    per: list[DataFrame] = []
    for name in fields:
        s = search_taat(spark, _field_dir(index_root, name), queries,
                        k=(1 << 31) - 1)
        b = float(boosts.get(name, 1.0))
        per.append(s.select(
            "query_id", "docid", F.lit(name).alias("field"),
            (F.col("score") * F.lit(b)).alias("fscore")))
    u = per[0]
    for p in per[1:]:
        u = u.unionByName(p)
    fs = (u.groupBy("query_id", "docid")
          .agg(F.sort_array(F.collect_list(
              F.struct("field", "fscore"))).alias("fs")))
    total = F.aggregate("fs", F.lit(0.0), lambda a, x: a + x["fscore"])
    best = F.aggregate("fs", F.lit(0.0),
                       lambda a, x: F.greatest(a, x["fscore"]))
    if mode == "most_fields":
        scored = fs.withColumn("score", total)
    else:
        scored = fs.withColumn(
            "score", best + F.lit(float(tie_breaker)) * (total - best))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (scored.drop("fs")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


def _combine_rows(rows_by_field: dict[str, "pd.DataFrame"],
                  boosts: dict[str, float], mode: str,
                  tie_breaker: float) -> "pd.DataFrame":
    """Driver-side cross-field combine over candidate (query, doc)
    pairs, replicating the exhaustive fold bit-for-bit: per pair, the
    boosted per-field scores fold in FIELD-NAME-SORTED order —
    ``sum`` starts at 0.0 and adds left-to-right (= the exhaustive
    ``aggregate`` over ``sort_array(struct(field, fscore))``), ``best``
    is the same fold with ``greatest``. Returns (query_id, docid,
    score) rows."""
    import numpy as np

    frames = []
    for name in sorted(rows_by_field):
        pdf = rows_by_field[name]
        if not len(pdf):
            continue
        b = float(boosts.get(name, 1.0))
        frames.append(pd.DataFrame({
            "query_id": pdf["query_id"].astype("int64"),
            "docid": pdf["docid"].astype("int64"),
            "field": name,
            "fscore": pdf["score"].astype("float64") * b,
        }))
    if not frames:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "docid": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    allp = pd.concat(frames, ignore_index=True)
    # fold order: (query, doc) group, fields ascending — concat order
    # already is field-name-sorted; a stable groupby preserves it
    out_q, out_d, out_s = [], [], []
    allp = allp.sort_values(["query_id", "docid", "field"], kind="stable")
    q = allp["query_id"].to_numpy()
    d = allp["docid"].to_numpy()
    fsc = allp["fscore"].to_numpy()
    n = len(allp)
    change = np.flatnonzero((q[1:] != q[:-1]) | (d[1:] != d[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    for s, e in zip(starts, ends):
        total = 0.0
        best = 0.0
        for v in fsc[s:e]:
            total = total + float(v)
            best = best if best >= float(v) else float(v)
        if mode == "most_fields":
            sc = total
        else:
            sc = best + float(tie_breaker) * (total - best)
        out_q.append(int(q[s])); out_d.append(int(d[s])); out_s.append(sc)
    return pd.DataFrame({"query_id": out_q, "docid": out_d, "score": out_s})


def _multi_match_pruned(spark: SparkSession, index_root: str,
                        queries: DataFrame, k: int,
                        fields: list[str], boosts: dict[str, float],
                        mode: str, tie_breaker: float) -> DataFrame:
    """Threshold-algorithm combiner (contract in search_multi_match).

    Per round: per-field exact top-k' via the block-max WAND engine
    (search_topk — never materializes a match set), candidate union +
    per-field thresholds τ_f (k'-th boosted score; 0 when the field is
    exhausted below k'), exact scores for ALL candidates from a
    candidate-restricted TAAT decode per field, combine driver-side in
    the exhaustive fold order, accept a query when its k-th candidate
    strictly beats combine(τ) — an unseen doc scores ≤ τ_f per field
    and the combine is monotone in each argument for 0 ≤ tie ≤ 1 —
    or when every field is exhausted; otherwise k' escalates ×4.
    """
    import numpy as np

    from .search import RESULT_SCHEMA, search_taat, search_topk

    from concurrent.futures import ThreadPoolExecutor

    qp = queries.select("query_id", "qtext").toPandas()
    pending = [int(x) for x in qp["query_id"]]
    results: dict[int, pd.DataFrame] = {}
    kprime = max(4 * k, 40)
    while pending:
        sub_q = spark.createDataFrame(
            qp[qp["query_id"].isin(pending)], "query_id long, qtext string")
        # per-field jobs are independent — run them concurrently so the
        # second field back-fills the first's task tail (guide §2.6)
        with ThreadPoolExecutor(max_workers=len(fields)) as pool:
            futs = {name: pool.submit(
                lambda n=name: search_topk(
                    spark, _field_dir(index_root, n), sub_q,
                    k=kprime).toPandas()) for name in fields}
            tops: dict[str, pd.DataFrame] = {
                name: f.result() for name, f in futs.items()}
        # candidate union + per-(query, field) thresholds. d_star = the
        # docid of the k'-th hit: WAND returns (score desc, docid asc),
        # so any UNSEEN doc whose field score TIES τ_f must have a
        # docid > d_star_f — the tie-break lever that settles
        # tie-heavy fields (e.g. short title fields, where thousands of
        # docs share one (tf, dl) score class and τ never drops).
        cand_pairs: dict[int, set] = {qid: set() for qid in pending}
        tau: dict[int, dict[str, float]] = {qid: {} for qid in pending}
        d_star: dict[int, dict[str, int]] = {qid: {} for qid in pending}
        exhausted: dict[int, bool] = {qid: True for qid in pending}
        for name in fields:
            b = float(boosts.get(name, 1.0))
            t = tops[name]
            for qid, g in t.groupby("query_id"):
                qid = int(qid)
                cand_pairs[qid].update(int(x) for x in g["docid"])
                if len(g) >= kprime:
                    last = g.loc[g["rank"].idxmax()]
                    tau[qid][name] = b * float(last["score"])
                    d_star[qid][name] = int(last["docid"])
                    exhausted[qid] = False
        cand_docids = np.array(
            sorted({d for s in cand_pairs.values() for d in s}),
            dtype=np.int64)
        if cand_docids.size == 0:
            for qid in pending:
                results[qid] = pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     "rank": pd.Series([], dtype="int32"),
                     "docid": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")})
            break
        # exact per-field scores for candidates only: the TAAT decode
        # drops non-candidates before its shuffle; the fold for a
        # surviving pair is unchanged, so scores are bit-identical.
        # Concurrent per field, like the top-k' pass above.
        with ThreadPoolExecutor(max_workers=len(fields)) as pool:
            futs = {name: pool.submit(
                lambda n=name: search_taat(
                    spark, _field_dir(index_root, n), sub_q,
                    return_matches=True,
                    _candidate_docids=cand_docids).toPandas())
                for name in fields}
            rows_by_field: dict[str, pd.DataFrame] = {
                name: f.result() for name, f in futs.items()}
        comb = _combine_rows(rows_by_field, boosts, mode, tie_breaker)
        # keep only each query's own candidate pairs (the docid-level
        # decode restriction spans queries, so query A's fold may have
        # produced pairs for query B's candidates — drop those; they
        # are exact scores but unproven-complete for A's ranking)
        if len(comb):
            mask = [int(dd) in cand_pairs.get(int(qq), ())
                    for qq, dd in zip(comb["query_id"], comb["docid"])]
            comb = comb[pd.Series(mask, index=comb.index)]
        still: list[int] = []
        for qid in pending:
            g = (comb[comb["query_id"] == qid]
                 .sort_values(["score", "docid"],
                              ascending=[False, True], kind="stable")
                 if len(comb) else comb)
            taus = tau[qid]
            tvals = [taus.get(name, 0.0) for name in sorted(fields)]
            total_t = 0.0
            best_t = 0.0
            for v in tvals:
                total_t += v
                best_t = best_t if best_t >= v else v
            bound = (total_t if mode == "most_fields"
                     else best_t + float(tie_breaker) * (total_t - best_t))
            n_above = int((g["score"] > bound).sum()) if len(g) else 0
            accepted = exhausted[qid] or n_above >= k
            if not accepted and len(g) >= k:
                # tie-aware acceptance: the k-th candidate may TIE the
                # bound. An unseen doc tying it must (a) hit τ_f in the
                # field(s) realizing the bound — for most_fields or
                # tie_breaker > 0 that is EVERY non-exhausted field
                # (the combine is strictly increasing per coordinate);
                # for pure best_fields, SOME bound-achieving field —
                # and (b) rank below k' there, i.e. have docid >
                # d_star_f (WAND order is score desc, docid asc). So
                # the k-th candidate wins every such tie when its docid
                # ≤ the smallest docid an unseen tying doc can have.
                row_k = g.iloc[k - 1]
                if float(row_k["score"]) == bound:
                    ds = d_star[qid]
                    if mode == "best_fields" and float(tie_breaker) == 0.0:
                        # unseen tying doc needs ONE bound-achieving
                        # field → its docid > min of those d_stars
                        lims = [ds[n] for n in ds
                                if taus.get(n, 0.0) == bound]
                        lim = min(lims) if lims else None
                    else:
                        # …needs EVERY non-exhausted field at τ → its
                        # docid > max of all d_stars
                        lim = max(ds.values()) if ds else None
                    if lim is not None and int(row_k["docid"]) <= lim:
                        accepted = True
            if accepted:
                top = g.head(k).reset_index(drop=True)
                results[qid] = pd.DataFrame({
                    "query_id": top["query_id"].astype("int64"),
                    "rank": pd.Series(
                        range(1, len(top) + 1), dtype="int32"),
                    "docid": top["docid"].astype("int64"),
                    "score": top["score"].astype("float64"),
                })
            else:
                still.append(qid)
        pending = still
        kprime *= 4
    out = (pd.concat([results[qid] for qid in sorted(results)],
                     ignore_index=True)
           if results else
           pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                         "rank": pd.Series([], dtype="int32"),
                         "docid": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64")}))
    return spark.createDataFrame(out, RESULT_SCHEMA)
