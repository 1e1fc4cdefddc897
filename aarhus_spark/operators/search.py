"""Query-time BM25 top-k retrieval (SURVEY.md §2.10, §3.2).

Two execution paths over the same segment artifacts, plus a pure-
DataFrame brute-force scorer; all three are rank- AND bit-identical
(3-way equivalence test, SURVEY §5):

Q1→Q4 ``search_taat``  — distributed term-at-a-time. Segment rows for
  the query terms (parquet scan with ``term IN`` pushdown → row-group
  skip) are decoded in ``mapInPandas`` (numpy), producing per-posting
  contributions idf·partial; per-(query,doc) scores are then summed
  with ``aggregate(sort_array(collect_list(struct(term,contrib))))`` —
  a fold in sorted term order, which pins the FP addition order to the
  frozen contract (§1.3.4) no matter how Spark shuffles. Scales to any
  corpus: the shuffle is bounded by the postings of the query terms.

Q1→Q5 ``search_wand`` — per-query block-max pruning. Each query's
  term rows are gathered with ``applyInPandas`` and scored document-
  at-a-time over the block-max metadata: the docid space is cut into
  elementary intervals at block boundaries, each interval's upper
  bound is Σ_t idf_t·max_partial(block_t covering it), intervals are
  processed in descending-bound order, and processing stops when the
  bound falls below the current top-k threshold — whole blocks are
  never decoded (Broder'03 WAND / Ding & Suel'11 block-max, re-shaped
  interval-at-a-time so the inner loop is numpy, not per-doc Python).
  Exact top-k: stop condition is strict (<), ties keep flowing.

Q7 ``brute_force_scorer_sql`` — the SQL-expressible twin used by the
  harness (DuckDB oracle): explode-tokenize → term stats → fold.

``search_topk`` is the DEFAULT entry point: it sizes the chunk-parallel
fan-out from the index stats (``default_n_ranges``) and routes to
``search_wand_ranges`` — falling back to the single-group ``search_wand``
only when one range suffices (small indexes), where the extra merge
stage would be pure overhead.
"""

from __future__ import annotations

import heapq
import json
import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..codec import decode_block, decode_block_ext, decode_positions_at
from ..config import FORMAT_VERSION, TOP_K
from ..hashing import xxhash64 as spark_xxhash64
from ..scoring import idf as _idf
from ..textops import tokenize, tokenize_series
from .build import (IndexPaths, read_dictionary, read_fragments,
                    read_segments)

RESULT_SCHEMA = "query_id long, rank int, docid long, score double"


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small driver-side frame as an Arrow-backed LocalRelation.

    ``createDataFrame(list)`` parallelizes the rows into an RDD of
    ``defaultParallelism`` slices, so EVERY materialization of the
    frame — a broadcast hash-relation build, a LocalTableScan feed, a
    ``collect`` — schedules a full task wave (~0.3 s for a 25-row
    frame at local[32], measured r8). The pandas/Arrow path embeds the
    rows in the logical plan as a LocalRelation instead: broadcast
    builds and collects run driver-side, job-free (same pipeline
    measured 0.55 → 0.26 s). Values are identical — the explicit DDL
    ``schema`` drives the Arrow conversion exactly as it drove the
    list path (oracle suite re-verified). ``schema`` must be a flat
    comma-separated DDL (no struct/map fields — the column-name parse
    splits on top-level commas only)."""
    names = [f.strip().split()[0] for f in schema.split(",")]
    return spark.createDataFrame(pd.DataFrame(list(rows), columns=names),
                                 schema=schema)


def localize_queries(spark: SparkSession, queries: DataFrame) -> DataFrame:
    """Collect a (human-scale, by contract) queries frame ONCE and
    re-embed it as an Arrow LocalRelation with the same schema.

    Ops that consume the frame more than once — rescore (primary pass
    + phrase pass), highlight/explain (top-k + term analysis),
    boosting (positive + negative match sets) — otherwise pay one full
    task wave PER consumer when handed an RDD-backed frame
    (``createDataFrame(list)``); localizing makes every later
    analysis/collect job-free (see :func:`local_df`). Already-local
    frames pass through untouched, so the common pandas-backed caller
    pays nothing. Values and schema are identical either way."""
    try:
        plan = queries._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() == "LocalRelation":
            return queries
    except Exception:  # pragma: no cover — introspection is best-effort
        pass
    return spark.createDataFrame(queries.toPandas(), schema=queries.schema)


def load_stats(index_dir: str) -> dict:
    """Read stats.json and REFUSE a layout-version mismatch: e.g. a v0.1
    index dir (tail rows present in BOTH segments/ and fragments/) read
    by layered-store code would silently double-serve tail postings —
    wrong scores, no error. Readers must fail loudly instead."""
    with open(IndexPaths(index_dir).stats) as f:
        st = json.load(f)
    ver = st.get("format_version")
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"index dir {index_dir!r} has on-disk layout version {ver!r} but "
            f"this engine reads version {FORMAT_VERSION}. Reading a mismatched "
            f"layout silently corrupts results (e.g. tail postings served "
            f"twice); rebuild the index or run the matching engine version.")
    return st


def _as_dirs(index_dir) -> list[str]:
    return [index_dir] if isinstance(index_dir, str) else list(index_dir)


def load_stats_multi(dirs: list[str]) -> tuple[int, float, dict[str, float]]:
    """Combined corpus stats over one or more index dirs (base + deltas):
    N = ΣN_i, avgdl = Σ(avgdl_i·N_i)/N. Returns per-dir avgdl too — WAND
    block bounds were computed with each dir's own avgdl and must be
    rescaled by max(1, avgdl_comb/avgdl_dir) to stay safe upper bounds
    (partial is increasing in avgdl; proof in operators/incremental.py).
    """
    n_total, sumdl, per_dir = 0, 0.0, {}
    for d in dirs:
        st = load_stats(d)
        n_total += int(st["N"])
        sumdl += float(st["avgdl"]) * int(st["N"])
        per_dir[d] = float(st["avgdl"])
    avgdl = sumdl / n_total if n_total else 0.0
    return n_total, avgdl, per_dir


def load_tombstones(spark: SparkSession, dirs) -> tuple[np.ndarray, int]:
    """Dead (tombstoned) docids over an index chain, with their Σdl.

    A delta built with ``on_recrawl='tombstone'`` (operators/
    incremental.py) writes a ``tombstones/`` parquet into its dir:
    one (docid, dl, url) row per base document superseded by a
    re-crawl. Query time must (a) never return a dead docid, and
    (b) score with corpus stats AS IF the dead docs were gone —
    N_eff, avgdl_eff here; per-term df correction in
    :func:`_global_df_map` (the monolithic-rebuild equivalence the
    harness verifies depends on all three).

    Returns (sorted dead docid array, Σdl of dead docs). Collected to
    the driver: tombstones are bounded by re-crawls per delta between
    compactions — the same cardinality class as the query-term lists
    the scorers already broadcast. Compaction purges them; the bound is
    ENFORCED (config.TOMBSTONE_BUDGET): past it this raises instead of
    silently bloating every scorer closure and broadcast.

    Defense in depth: docids are DEDUPLICATED across the chain before
    the Σdl — a duplicate tombstone row (e.g. from a buggy writer)
    would otherwise corrupt N_eff/avgdl_eff and feed a non-unique
    array into the assume_unique np.isin calls downstream.
    """
    import pandas as pd

    from ..config import TOMBSTONE_BUDGET
    frames = []
    for d in _as_dirs(dirs):
        tpath = os.path.join(d, "tombstones")
        if os.path.isdir(tpath) and any(
                f.endswith(".parquet") for f in os.listdir(tpath)):
            frames.append(spark.read.parquet(tpath).select("docid", "dl").toPandas())
    if not frames:
        return np.empty(0, dtype=np.int64), 0
    pdf = pd.concat(frames, ignore_index=True).drop_duplicates("docid")
    if len(pdf) > TOMBSTONE_BUDGET:
        raise ValueError(
            f"index chain carries {len(pdf)} tombstoned docids, past the "
            f"enforced budget of {TOMBSTONE_BUDGET} (config.TOMBSTONE_BUDGET / "
            f"$AARHUS_TOMBSTONE_BUDGET). The dead-docid set rides in every "
            f"scorer closure and broadcast — compact the chain "
            f"(operators.compact.compact_indexes purges tombstones "
            f"physically) before querying it further.")
    dead = np.sort(pdf["docid"].to_numpy(np.int64))
    return dead, int(pdf["dl"].sum())


def _chain_stats(spark: SparkSession, index_dir) -> tuple[int, float, dict[str, float], np.ndarray]:
    """Combined (N_eff, avgdl_eff, per-dir avgdl, dead docids) for an
    index chain, tombstones applied: N_eff = ΣN − |dead|, avgdl_eff =
    (Σdl − Σdl_dead)/N_eff. The per-dir avgdl (for block-bound
    rescaling) stays the BUILD-time value — the stored bounds were
    computed with it; max(1, avgdl_eff/avgdl_dir) remains a safe upper
    bound by the monotonicity proof in load_stats_multi."""
    dirs = _as_dirs(index_dir)
    n_total, avgdl, per_dir = load_stats_multi(dirs)
    dead, dl_dead = load_tombstones(spark, dirs)
    if dead.size:
        sumdl = avgdl * n_total - dl_dead
        n_total -= int(dead.size)
        avgdl = sumdl / n_total if n_total else 0.0
    return n_total, avgdl, per_dir, dead


def docid_domain(dirs: list[str]) -> tuple[int, int]:
    """Inclusive [lo, hi] docid domain over the index dirs, from each
    dir's persisted build_config (docid_offset + N). Docids are dense in
    [offset, offset+N) per dir by construction (dense url-rank + offset,
    build.py), so this is exact — and unlike ``[0, ΣN)`` it stays correct
    for a delta index queried on its own, whose docids all sit at
    offset ≥ N_base (they would otherwise fall outside every range and
    silently return empty results)."""
    lo, hi = None, None
    for d in dirs:
        st = load_stats(d)
        n = int(st["N"])
        if n == 0:
            continue
        off = int(st.get("build_config", {}).get("docid_offset", 0))
        lo = off if lo is None else min(lo, off)
        hi = off + n - 1 if hi is None else max(hi, off + n - 1)
    if lo is None:
        return 0, -1
    return lo, hi


# ---------------------------------------------------------------------------
# Q1: query analysis (same frozen tokenizer as the build)
# ---------------------------------------------------------------------------

def analyze_queries(queries: DataFrame) -> DataFrame:
    """(query_id, qtext) -> distinct (query_id, term)."""

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.dropna(subset=["qtext"])   # must-only bool queries
            if len(pdf) == 0:
                continue
            ex = pd.DataFrame({"query_id": pdf["query_id"],
                               "term": tokenize_series(pdf["qtext"])})
            ex = ex.explode("term").dropna(subset=["term"]).drop_duplicates()
            yield ex

    return queries.mapInPandas(tok, schema="query_id long, term string")


def analyze_neg_queries(queries: DataFrame) -> DataFrame | None:
    """ES bool.must_not clause analysis: if the queries DataFrame
    carries a nullable ``neg_qtext`` column, analyze it with the SAME
    frozen tokenizer as the positive text and return distinct
    (query_id, term) exclusion pairs; None when the column is absent
    (the common no-bool case costs nothing)."""
    if "neg_qtext" not in queries.columns:
        return None
    nq = (queries.filter(F.col("neg_qtext").isNotNull())
          .select("query_id", F.col("neg_qtext").alias("qtext")))
    return analyze_queries(nq)


def analyze_must_queries(queries: DataFrame) -> DataFrame | None:
    """ES bool.must clause analysis: a nullable ``must_qtext`` column
    holds per-query REQUIRED terms — every analyzed must-term (OOV
    included) has to match, while ``qtext`` becomes the optional
    should-clause set (matched count ≥ min_should_match, default 0 when
    a must clause is present — exactly ES's default). None when the
    column is absent."""
    if "must_qtext" not in queries.columns:
        return None
    mq = (queries.filter(F.col("must_qtext").isNotNull())
          .select("query_id", F.col("must_qtext").alias("qtext")))
    return analyze_queries(mq)


def _check_bool_args(require_all: bool, min_should_match: int | None,
                     has_must: bool = False) -> None:
    if require_all and min_should_match is not None:
        raise ValueError("require_all (bool.must over every term) and "
                         "min_should_match are mutually exclusive — must is "
                         "minimum_should_match = |analyzed terms|")
    if require_all and has_must:
        raise ValueError("require_all and a must_qtext column are mutually "
                         "exclusive — require_all already makes every qtext "
                         "term a must clause; put required terms in must_qtext "
                         "and optional ones in qtext instead")
    if min_should_match is not None and min_should_match < 1:
        raise ValueError(f"min_should_match must be >= 1, got {min_should_match}")


def _check_score_mode(score_mode: str) -> None:
    if score_mode not in ("bm25", "proximity"):
        raise ValueError(f"score_mode must be 'bm25' or 'proximity', "
                         f"got {score_mode!r}")


def _min_window_flat(pos: np.ndarray, labels: np.ndarray) -> int:
    """Width (max − min) of the smallest position window containing at
    least one position of EVERY distinct label — the classic k-sorted-
    lists minimum-cover, two-pointer over the position-sorted stream.
    0 when only one distinct label is present. Both proximity paths
    (WAND per-candidate, TAAT per-row UDF) funnel here, so the integer
    width — and therefore the adjusted score — is trivially identical."""
    uniq = np.unique(labels)
    if uniq.size <= 1:
        return 0
    order = np.argsort(pos, kind="stable")
    p = pos[order]
    t = np.searchsorted(uniq, labels[order])   # labels -> dense 0..m-1
    need = uniq.size
    count = np.zeros(need, dtype=np.int64)
    have = 0
    best = np.iinfo(np.int64).max
    lo = 0
    for hi in range(p.size):
        c = t[hi]
        count[c] += 1
        if count[c] == 1:
            have += 1
        while have == need:
            w = int(p[hi]) - int(p[lo])
            if w < best:
                best = w
            c2 = t[lo]
            count[c2] -= 1
            if count[c2] == 0:
                have -= 1
            lo += 1
    return best


def _min_window(pos_lists: list[np.ndarray]) -> int:
    """Min-cover width over per-term position lists (one list per
    distinct matched term)."""
    if len(pos_lists) <= 1:
        return 0
    pos = np.concatenate(pos_lists)
    labels = np.concatenate([np.full(a.size, i, dtype=np.int64)
                             for i, a in enumerate(pos_lists)])
    return _min_window_flat(pos, labels)


@F.pandas_udf(LongType())
def _width_of_entries(cs: pd.Series) -> pd.Series:
    """Per-row min-cover width over the collected (term, contrib, pos)
    struct array of search_taat's proximity mode — one position list
    per matched positive term (terms are unique per (query, doc))."""
    out = np.zeros(len(cs), dtype=np.int64)
    for i, entries in enumerate(cs):
        out[i] = _min_window([np.asarray(e["pos"], dtype=np.int64)
                              for e in entries])
    return pd.Series(out)


# ---------------------------------------------------------------------------
# Q3: candidate segment rows with term pushdown
# ---------------------------------------------------------------------------

def candidate_segments(spark: SparkSession, index_dir, terms: list[str]) -> DataFrame:
    """Parquet scan of segment rows restricted to the query terms — the
    ``isin`` predicate reaches the scan (PushedFilters) and skips row
    groups via min/max + dictionary stats. Accepts one dir or a list
    (base + delta indexes); each row carries its dir's build avgdl so
    scorers can rescale block bounds.

    The segment store is LAYERED (build.py merge stage): head/oversized
    terms live merged+chunked in ``segments/``; tail terms are served
    directly from their single fragment row in ``fragments/`` (df = n,
    chunk = 0) — the build never rewrites them."""
    dirs = _as_dirs(index_dir)
    _, _, per_dir = load_stats_multi(dirs)
    out = None
    for d in dirs:
        st = load_stats(d)
        maxpost = int(st.get("build_config", {}).get(
            "max_postings_per_row", 1 << 62))
        seg = None
        # layer existence cached in stats.json at build time — no
        # per-query directory listing, and an EMPTY layer (has_head
        # False: a corpus with no head terms — every small index) is
        # not scanned or unioned at all. Missing key (pre-r8 index) =
        # scan as before.
        if st.get("has_head", True):
            seg = (read_segments(spark, d)
                   .filter(F.col("term").isin(terms)))
        frag_dir = IndexPaths(d).fragments
        if st.get("has_tail", os.path.isdir(frag_dir) and bool(os.listdir(frag_dir))):
            # fragment rows are written in xxhash64(term) order (the
            # shuffle sort key), so row-group min/max stats are tight on
            # thash, NOT on term — push the equivalent hash predicate
            # (driver-side hashing.xxhash64 ≡ Spark's xxhash64, pinned
            # by test) so tail lookups still skip row groups; the exact
            # term filter stays for hash-collision correctness
            tail = read_fragments(spark, d)
            tfilter = (F.col("term").isin(terms)
                       & ~F.col("is_head") & (F.col("n") <= maxpost))
            if "thash" in tail.columns:
                tfilter = F.col("thash").isin(
                    [spark_xxhash64(t) for t in terms]) & tfilter
            tail = (tail.filter(tfilter)
                    .select("term", F.col("n").alias("df"), "cf",
                            F.lit(0).alias("chunk"), "n", "first_docid",
                            "blocks", "postings"))
            seg = tail if seg is None else seg.unionByName(tail)
        if seg is None:      # both layers recorded absent (empty index)
            from .build import SEGMENT_SCHEMA
            seg = spark.createDataFrame([], SEGMENT_SCHEMA)
        seg = seg.withColumn("src_avgdl", F.lit(per_dir[d]))
        out = seg if out is None else out.unionByName(seg)
    return out


def _global_df_map(spark: SparkSession, index_dir, terms: list[str],
                   seg: DataFrame | None = None,
                   dead: np.ndarray | None = None) -> dict[str, int]:
    """Global df per candidate term = Σ df over the per-dir dictionaries
    (tiny: ≤ |query terms| rows collected). Reads the dictionary parquet
    with a pushed ``term IN`` filter instead of aggregating the segment
    rows — the segments are then scanned exactly once, by the scorer.

    With tombstones (``dead`` non-empty and ``seg`` given): df must
    count LIVE postings only — a monolithic rebuild would never have
    indexed the superseded doc. The dictionaries can't know which docs
    died after their build, so the correction is computed at query time
    from the candidate rows themselves: one extra distributed pass that
    decodes ONLY blocks whose docid span intersects the dead set
    (searchsorted skip — on a mostly-live index nearly every block is
    skipped undecoded) and counts dead members per term. Bounded by the
    query terms' postings, like the scorer scan itself."""
    out: dict[str, int] = {}
    for d in _as_dirs(index_dir):
        rows = (read_dictionary(spark, d)
                .filter(F.col("term").isin(terms))
                .select("term", "df").collect())
        for r in rows:
            out[r["term"]] = out.get(r["term"], 0) + int(r["df"])
    if dead is not None and dead.size and seg is not None and out:
        dead_arr = dead  # closure capture (sorted)

        def count_dead(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for term, first, payload, blks in zip(
                        pdf["term"], pdf["first_docid"], pdf["postings"], pdf["blocks"]):
                    buf = np.frombuffer(payload, dtype=np.uint8)
                    c, prev_last = 0, int(first) - 1
                    for b in blks:
                        last = int(b["last_docid"])
                        lo = np.searchsorted(dead_arr, prev_last + 1, side="left")
                        hi = np.searchsorted(dead_arr, last, side="right")
                        if hi > lo:  # some dead docid falls in this block's span
                            d_ids, _, _ = decode_block(buf, int(b["offset"]))
                            c += int(np.isin(d_ids, dead_arr[lo:hi],
                                             assume_unique=True).sum())
                        prev_last = last
                    if c:
                        rows.append((term, c))
                if rows:
                    yield pd.DataFrame(rows, columns=["term", "dead_n"])

        dc = (seg.select("term", "first_docid", "blocks", "postings")
              .mapInPandas(count_dead, schema="term string, dead_n long")
              .groupBy("term").agg(F.sum("dead_n").alias("dead_n")).collect())
        for r in dc:
            out[r["term"]] = out[r["term"]] - int(r["dead_n"])
    return out


def _collect_terms(qterms: DataFrame) -> list[str]:
    return [r["term"] for r in qterms.select("term").distinct().collect()]


QTERMS_SCHEMA = "query_id long, term string"


class _QueryAnalysis:
    """Driver-side analysis of the (human-scale) query table.

    The previous per-clause pipeline (``analyze_queries`` mapInPandas →
    ``distinct`` exchange → ``collect``, once per should/must/must_not
    clause) launched up to three Spark jobs per search call just to
    learn the query terms — ~0.4 s each at local[32] — and the later
    broadcast join had to build its hash relation from a Python-stage
    plan. Query lists are driver-known, human-scale inputs (the same
    cardinality class every scorer already closure-captures), so ONE
    narrow Arrow ``toPandas`` + the identical frozen tokenizer
    (``textops.tokenize_series``) replaces all of it; the qterms frames
    handed to joins become LocalTableScans, whose broadcast build has
    no Python stage. Bit-identical analysis by construction: the same
    tokenizer runs over the same strings (pinned by tests against
    ``analyze_queries``).
    """

    def __init__(self, spark: SparkSession, queries: DataFrame):
        self._spark = spark
        cols = [c for c in ("query_id", "qtext", "neg_qtext", "must_qtext")
                if c in queries.columns]
        qp = queries.select(*cols).toPandas()
        self.qterms_pdf = self._explode(qp, "qtext")
        self.neg_pdf = (self._explode(qp, "neg_qtext")
                        if "neg_qtext" in qp.columns else None)
        self.must_pdf = (self._explode(qp, "must_qtext")
                         if "must_qtext" in qp.columns else None)
        # "column present but all null" degrades to "no clause", exactly
        # like the DataFrame path's empty-collect checks
        if self.neg_pdf is not None and not len(self.neg_pdf):
            self.neg_pdf = None
        if self.must_pdf is not None and not len(self.must_pdf):
            self.must_pdf = None
        self.terms = sorted(self.qterms_pdf["term"].unique())
        self.neg_terms = (sorted(self.neg_pdf["term"].unique())
                          if self.neg_pdf is not None else [])
        self.must_terms = (sorted(self.must_pdf["term"].unique())
                           if self.must_pdf is not None else [])

    @staticmethod
    def _explode(qp: pd.DataFrame, col: str) -> pd.DataFrame:
        """Distinct (query_id, term) — the exact analyze_queries
        transform (tokenize → explode → dropna → drop_duplicates)."""
        pdf = qp.dropna(subset=[col])
        if not len(pdf):
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "term": pd.Series([], dtype="object")})
        ex = pd.DataFrame({"query_id": pdf["query_id"].astype("int64"),
                           "term": tokenize_series(pdf[col])})
        return (ex.explode("term").dropna(subset=["term"])
                .drop_duplicates().reset_index(drop=True))

    @property
    def all_terms(self) -> list[str]:
        return sorted(set(self.terms) | set(self.neg_terms)
                      | set(self.must_terms))

    def qterms_df(self) -> DataFrame:
        return self._spark.createDataFrame(self.qterms_pdf, QTERMS_SCHEMA)

    def kinds_df(self) -> DataFrame:
        """The _qterms_with_kinds frame (kind 0=should/1=must/2=must_not,
        max-deduped per (query, term)) as a LocalTableScan; plain qterms
        when no bool clause exists — same contract as the DataFrame
        version."""
        if self.neg_pdf is None and self.must_pdf is None:
            return self.qterms_df()
        frames = [self.qterms_pdf.assign(kind=0)]
        if self.must_pdf is not None:
            frames.append(self.must_pdf.assign(kind=1))
        if self.neg_pdf is not None:
            frames.append(self.neg_pdf.assign(kind=2))
        allp = pd.concat(frames, ignore_index=True)
        kinds = (allp.groupby(["query_id", "term"], as_index=False)["kind"]
                 .max())
        return self._spark.createDataFrame(
            kinds, QTERMS_SCHEMA + ", kind int")

    def qn_df(self) -> DataFrame:
        """|distinct analyzed terms| per query (the require_all target)."""
        qn = (self.qterms_pdf.groupby("query_id", as_index=False)
              .size().rename(columns={"size": "qn"}))
        return self._spark.createDataFrame(qn, "query_id long, qn long")

    def qn_map(self) -> dict[int, int]:
        return {int(q): int(n) for q, n in
                self.qterms_pdf.groupby("query_id").size().items()}

    def must_qn_df(self) -> DataFrame:
        qn = (self.must_pdf.groupby("query_id", as_index=False)
              .size().rename(columns={"size": "qn_must"}))
        return self._spark.createDataFrame(qn, "query_id long, qn_must long")

    def must_term_map(self) -> dict[int, set] | None:
        if self.must_pdf is None:
            return None
        out: dict[int, set] = {}
        for q, t in zip(self.must_pdf["query_id"], self.must_pdf["term"]):
            out.setdefault(int(q), set()).add(t)
        return out


def _dfg_or_none(spark: SparkSession, index_dir, terms: list[str],
                 seg: DataFrame, dead: np.ndarray) -> dict[str, int] | None:
    """Global-df map ONLY when the segment rows' own ``df`` column can't
    serve: multi-dir chains (per-dir rows carry per-dir df) or live
    tombstones (df must count live postings). On a single plain dir the
    stored df IS the global df — head chunks carry the merger's
    df_total, tail rows df = n — so the dictionary-lookup job (and with
    tombstones, the correction pass) is skipped entirely; scorers fall
    back to the per-row df."""
    dirs = _as_dirs(index_dir)
    if len(dirs) == 1 and not dead.size:
        return None
    return _global_df_map(spark, index_dir, terms, seg=seg, dead=dead)


def _dfg_from_rows(g: pd.DataFrame, dfg: dict | None) -> dict:
    """Per-group term→df map from the candidate rows themselves (the
    dfg=None fast path; every chunk row stores the term's global df)."""
    if dfg is not None:
        return dfg
    out: dict = {}
    for t, df_ in zip(g["term"], g["df"]):
        if t not in out:
            out[t] = float(df_)
    return out


# ---------------------------------------------------------------------------
# Q4: distributed TAAT scoring with exact fold order
# ---------------------------------------------------------------------------

def search_taat(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    require_all: bool = False,
    min_should_match: int | None = None,
    score_mode: str = "bm25",
    return_matches: bool = False,
    _candidate_docids: np.ndarray | None = None,
) -> DataFrame:
    """Distributed top-k. Returns (query_id, rank, docid, score).

    ``_candidate_docids`` (internal — the multi_match pruned combiner):
    a SORTED unique docid array; the decode pass drops every other
    docid BEFORE the shuffle, so the fold/aggregation runs over
    candidate rows only. Scores for surviving (query, doc) pairs are
    bit-identical to the unrestricted run (the per-pair fold sees
    exactly the same entries). bm25 score_mode only.

    ``return_matches=True`` (round 7) skips the final top-k window and
    returns the full scored match set (query_id, docid, score) — the
    seam the ES aggregations layer (operators/eslayer.py: facets,
    function_score, search_after pagination) hangs off, since ES
    computes those over ALL matching docs, not the top k.

    ``score_mode="proximity"`` (opt-in, round 7): multiply each doc's
    BM25 sum by 1/(1 + min_window_width) over the positions of its
    matched positive terms (contract in :func:`_wand_one_query`). The
    decode pass additionally carries each (term, doc) posting's
    position list; the width is computed per (query, doc) from the
    same collected struct array the fold already aggregates — no extra
    shuffle — and funnels through the same ``_min_window_flat`` as the
    WAND path, so the two stay bit-identical (asserted in tests).

    ``require_all=True`` is conjunctive (ES ``bool.must``) semantics:
    a document scores only if it matches EVERY analyzed query term —
    including out-of-vocabulary terms, which therefore empty the result
    (exactly ES's behavior for a must-clause on a missing term). The
    filter is a counting predicate on the same aggregation the
    disjunctive fold already does: zero extra shuffles.

    ``min_should_match=m`` (ES ``bool.should`` + ``minimum_should_match``):
    a document scores only if it matches at least m distinct analyzed
    terms; the score sums over the terms it DOES match (standard ES
    should-clause scoring). Same counting predicate, ``>=`` instead of
    ``==``. A query with fewer in-vocabulary terms than m empties
    naturally (an OOV should-clause can never match).

    ``bool.must_not``: a nullable ``neg_qtext`` column on the queries
    DataFrame is analyzed with the same tokenizer; a document matching
    ANY excluded term is dropped before ranking and excluded terms
    contribute nothing to the score (ES non-scoring must_not). One
    decode pass serves both sides: excluded-term postings join the same
    decoded stream flagged by ``kind``, so exclusion is a per-(query,
    doc) flag on the aggregation the disjunctive fold already does —
    zero extra shuffles, no second decode.

    ``bool.must`` + should (mixed, round 6): a nullable ``must_qtext``
    column holds per-query REQUIRED terms — a doc scores only if it
    matches every analyzed must term (OOV must terms empty the query);
    ``qtext`` then carries the optional should clauses, gated by
    ``min_should_match`` (default 0 with a must clause present — the
    ES default). Scores sum over every matched positive term once, in
    sorted-term fold order (a term in both clauses counts as must).
    Same single aggregation: clause-split counts are conditional sums
    over the ``kind`` flag."""
    from pyspark.sql.window import Window

    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    _check_score_mode(score_mode)
    prox = score_mode == "proximity"
    if _candidate_docids is not None and prox:
        raise ValueError("_candidate_docids supports score_mode='bm25' only")
    cand_arr = _candidate_docids
    qa = _QueryAnalysis(spark, queries)
    terms, neg_terms, must_terms = qa.terms, qa.neg_terms, qa.must_terms
    has_must = qa.must_pdf is not None
    _check_bool_args(require_all, min_should_match, has_must=has_must)
    if not terms and not must_terms:
        return spark.createDataFrame(
            [], schema=("query_id long, docid long, score double"
                        if return_matches else RESULT_SCHEMA))
    has_neg = bool(neg_terms)
    all_terms = qa.all_terms
    seg = candidate_segments(spark, index_dir, all_terms)
    dfg = _dfg_or_none(spark, index_dir, all_terms, seg=seg, dead=dead)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..scoring import partial as _partial
        for pdf in batches:
            # few rows per batch (one per (term, chunk)); plain column
            # zip — no pandas row materialization. dfg=None (single
            # plain dir): idf comes from the row's own stored global df.
            for term, row_df, payload, blks in zip(
                    pdf["term"], pdf["df"], pdf["postings"], pdf["blocks"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                if prox:
                    # proximity mode also carries each posting's
                    # position list through the aggregation
                    parts, pos_parts = [], []
                    for bi, b in enumerate(blks):
                        blk_end = (int(blks[bi + 1]["offset"])
                                   if bi + 1 < len(blks) else buf.size)
                        d, tf, dl, pos_off = decode_block_ext(buf, int(b["offset"]))
                        pos_parts.append(decode_positions_at(
                            buf, pos_off, tf, end=blk_end))
                        parts.append((d, tf, dl))
                else:
                    parts = [decode_block(buf, int(b["offset"])) for b in blks]
                if not parts:
                    continue
                docids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                if cand_arr is not None:
                    # prune NON-candidates before the shuffle (a term's
                    # docids are unique; cand_arr sorted unique)
                    keep = np.isin(docids, cand_arr, assume_unique=True)
                    if not keep.any():
                        continue
                    docids, tfs, dls = docids[keep], tfs[keep], dls[keep]
                w = _idf(float(dfg[term]) if dfg is not None
                         else float(row_df), n_docs)
                # exact: partial recomputed from (tf, dl) with the
                # COMBINED avgdl — stored block bounds are not used here
                contrib = w * _partial(tfs, dls, avgdl)
                if prox:
                    pos = np.concatenate(pos_parts).astype(np.int64)
                    yield pd.DataFrame({
                        "term": term, "docid": docids, "contrib": contrib,
                        "pos": np.split(pos, np.cumsum(tfs)[:-1])})
                else:
                    yield pd.DataFrame({"term": term, "docid": docids,
                                        "contrib": contrib})

    dec_schema = ("term string, docid long, contrib double, pos array<long>"
                  if prox else "term string, docid long, contrib double")
    decoded = seg.select("term", "df", "blocks", "postings").mapInPandas(
        decode, schema=dec_schema)
    if dead.size:
        # Arrow path, not a Python list of tuples: the dead set is
        # budget-bounded at TOMBSTONE_BUDGET (2M) and a row-by-row
        # driver serialization is needlessly slow near that ceiling
        dead_df = spark.createDataFrame(
            pd.DataFrame({"docid": dead.astype(np.int64)}))
        decoded = decoded.join(F.broadcast(dead_df), "docid", "left_anti")

    # proximity mode rides the SAME aggregation: the struct gains the
    # pos array as a trailing field (sort_array still orders by the
    # unique term prefix, so the fold order is unchanged)
    entry = (F.struct("term", "contrib", "pos") if prox
             else F.struct("term", "contrib"))
    if not has_neg and not has_must:
        scored = (
            decoded.join(F.broadcast(qa.qterms_df()), "term")
            .groupBy("query_id", "docid")
            .agg(F.sort_array(F.collect_list(entry)).alias("cs"))
            .withColumn("score", F.aggregate(
                "cs", F.lit(0.0), lambda acc, x: acc + x["contrib"]))
        )
        if require_all:
            # |matched terms| per (query, doc) vs |analyzed terms| per query
            scored = (scored.join(F.broadcast(qa.qn_df()), "query_id")
                      .filter(F.size("cs") == F.col("qn")).drop("qn"))
        elif min_should_match is not None:
            scored = scored.filter(F.size("cs") >= F.lit(min_should_match))
    else:
        # bool clauses in the SAME aggregation: the decoded stream joins
        # the kind-flagged union of should/must/must_not query terms
        # (0/1/2, max-deduped per (query, term) — _QueryAnalysis.kinds_df);
        # collect_list skips the nulled must_not structs, so the fold
        # order over positive terms is unchanged; clause-split counts
        # are conditional sums over the same rows — zero extra shuffles
        qterms_all = qa.kinds_df()
        scored = (
            decoded.join(F.broadcast(qterms_all), "term")
            .groupBy("query_id", "docid")
            .agg(F.sort_array(F.collect_list(
                    F.when(F.col("kind") < 2, entry)
                 )).alias("cs"),
                 F.sum(F.when(F.col("kind") == 1, 1).otherwise(0)).alias("must_cnt"),
                 F.max(F.col("kind") == 2).alias("neg_hit"))
            .filter(~F.col("neg_hit") & (F.size("cs") > 0)).drop("neg_hit")
            .withColumn("score", F.aggregate(
                "cs", F.lit(0.0), lambda acc, x: acc + x["contrib"]))
        )
        if require_all:     # has_must is False here (_check_bool_args)
            scored = (scored.join(F.broadcast(qa.qn_df()), "query_id")
                      .filter(F.size("cs") == F.col("qn")).drop("qn"))
        else:
            if has_must:
                # every analyzed must term (OOV included) has to match
                scored = (scored.join(F.broadcast(qa.must_qn_df()),
                                      "query_id", "left")
                          .filter(F.col("must_cnt")
                                  == F.coalesce("qn_must", F.lit(0)))
                          .drop("qn_must"))
            if min_should_match is not None:
                scored = scored.filter(
                    F.size("cs") - F.col("must_cnt") >= F.lit(min_should_match))
        scored = scored.drop("must_cnt")
    if prox:
        # same double expression as the WAND kernel: s * (1.0/(1.0+w))
        scored = scored.withColumn(
            "score",
            F.col("score") * (F.lit(1.0) /
                              (F.lit(1.0) +
                               _width_of_entries(F.col("cs")).cast("double"))))
    scored = scored.drop("cs")
    if return_matches:
        return scored.select("query_id", "docid", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "docid", "score")
    )


# ---------------------------------------------------------------------------
# Q5: block-max WAND (per-query, interval-at-a-time, exact)
# ---------------------------------------------------------------------------

def _wand_one_query(g: pd.DataFrame, n_docs: int, avgdl: float, k: int,
                    dfg: dict | None = None,
                    range_lo: int = 0, range_hi: int | None = None,
                    min_match: int | None = None,
                    must_terms: frozenset | None = None,
                    n_must: int = 0,
                    dead: np.ndarray | None = None,
                    score_mode: str = "bm25") -> pd.DataFrame:
    """When (range_lo, range_hi) restrict the docid space, only docs in
    that range are scored (blocks outside are never decoded) — the
    chunk-parallel mode of :func:`search_wand_ranges`. Exact within the
    range: a doc's full term set is present in any group that contains
    rows overlapping its docid.

    ``min_match`` (ES bool semantics on the WAND path): a doc scores
    only if it matches at least ``min_match`` distinct query terms.
    ``bool.must`` (require_all) passes |analyzed terms| — a doc can
    match at most that many, so ``>=`` degenerates to "all of them",
    and an OOV must-term empties the result exactly like ES;
    ``minimum_should_match=m`` passes m directly. Block-max pruning
    stays valid — the disjunctive interval bound is an upper bound for
    any matched subset — and two extra skips apply: intervals covered
    by fewer than ``min_match`` distinct positive terms can't contain
    a match, and the per-doc term count falls out of the contribution
    entries for free (a doc appears in at most one covering block per
    term, so entries per doc = matched distinct terms).

    ``must_terms``/``n_must`` (mixed ES bool, round 6): the query's
    required clause as a term set — a doc scores only if it matches
    ALL ``n_must`` analyzed must terms (n_must counts OOV must terms
    too, so those empty the result); ``min_match`` then applies to the
    SHOULD terms alone (the remaining positive terms; default None =
    optional, exactly ES's minimum_should_match default when a must
    clause is present). Scores still sum over every matched positive
    term in sorted-term fold order. The same two skips split by
    clause: an interval missing a must term, or covering fewer should
    terms than min_match, can't contain a match.

    ``bool.must_not``: rows flagged ``is_neg`` (excluded-term posting
    rows joined into the group by the caller) contribute NO score and
    no interval upper bound; their blocks are decoded LAZILY — only in
    intervals that actually get scored — and every candidate docid they
    contain is masked before the heap, so an excluded doc is never
    returned. Non-scoring exclusion, exactly ES must_not.

    ``dead`` (tombstoned docids, sorted int64): masked out of every
    candidate set before the heap — the re-crawl overwrite path
    (operators/incremental.py) marks superseded base docids dead and
    query time must never return them.

    ``score_mode="proximity"`` (opt-in, round 7 — the bool-path analog
    of search_phrase's proximity mode): each candidate's BM25 sum is
    multiplied by 1/(1 + min_window_width), where min_window_width is
    the width (max − min position) of the smallest window containing
    at least one occurrence of EVERY distinct positive term the doc
    matched — 0 (factor 1.0) for single-term matches. Block-max
    pruning stays exact: the factor is ≤ 1, so every BM25 interval
    upper bound still bounds the adjusted score, and the pre-heap
    theta mask (BM25 ≥ theta) keeps a superset of the docs that can
    enter the heap. Positions decode lazily — only for blocks in
    intervals that actually get scored, only after the theta mask —
    via the same decode_block_ext/decode_positions_at two-pass split
    the phrase path uses. Bit-identical to search_taat's proximity
    mode (the width funnels through the same _min_window_flat and the
    adjustment is the same double expression s * (1.0/(1.0+w)))."""
    from ..scoring import partial as _partial

    prox = score_mode == "proximity"

    if range_hi is None:
        range_hi = np.iinfo(np.int64).max
    qid = int(g["query_id"].iloc[0])
    gneg = None
    if "kind" in g.columns:
        neg_mask = g["kind"].to_numpy() == 2
        gneg = g[neg_mask]
        g = g[~neg_mask]
        if len(g) == 0:
            # no positive term has postings here — nothing can score
            # (a must_not-only query is not a top-k relevance query)
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int32"),
                                 "docid": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
    # term-level structures; chunks of the same term behave as extra
    # blocks. Plain column zip — no pandas row materialization (the
    # codebase idiom; an iterrows here costs one Python Series build per
    # (term, chunk) row).
    src_it = g["src_avgdl"] if "src_avgdl" in g.columns else [None] * len(g)
    term_rows: dict[str, list[tuple]] = {}
    for row in zip(g["term"], g["chunk"], g["first_docid"], g["df"],
                   g["blocks"], g["postings"], src_it):
        term_rows.setdefault(row[0], []).append(row)
    terms = sorted(term_rows)  # frozen summation order §1.3.4
    # must-clause term indexes; a must term with NO postings in this
    # group leaves len(must_ti) < n_must and every interval skips —
    # the OOV-must → empty contract falls out for free
    must_ti = ({ti for ti, t in enumerate(terms) if t in must_terms}
               if must_terms is not None else None)
    track_ti = must_ti is not None or min_match is not None

    # block table: (start, end, ub, term_idx, payload_ref, offset).
    # Rows from a delta/base mix are ordered by (first_docid, chunk) —
    # src docid ranges are disjoint across dirs by construction
    # (docid_offset). Block bounds stored at build time used that dir's
    # avgdl; rescale by max(1, avgdl/src_avgdl) — a proven-safe upper
    # bound (partial is increasing in avgdl; see load_stats_multi
    # docstring). Each row's first block starts at the row's TRUE
    # first_docid (stored since format v3), so a block never covers
    # intervals before its first posting.
    blocks = []
    idfs = {}
    for ti, t in enumerate(terms):
        rows = sorted(term_rows[t], key=lambda r: (int(r[2]), int(r[1])))
        df_t = float(dfg[t]) if dfg is not None else float(rows[0][3])
        idfs[t] = _idf(df_t, n_docs)
        for (_t, _chunk, first_docid, _df, blks, payload, src_avgdl) in rows:
            buf = np.frombuffer(payload, dtype=np.uint8)
            scale = max(1.0, avgdl / float(src_avgdl)) if src_avgdl is not None else 1.0
            prev_last = int(first_docid) - 1
            for bi, b in enumerate(blks):
                # end byte = next block's offset (payload end for the
                # last) — bounds the lazy position decode in proximity
                # mode, exactly like the phrase two-pass path
                blk_end = (int(blks[bi + 1]["offset"])
                           if bi + 1 < len(blks) else buf.size)
                blocks.append((prev_last + 1, int(b["last_docid"]),
                               idfs[t] * float(b["max_partial"]) * scale,
                               ti, buf, int(b["offset"]), blk_end))
                prev_last = int(b["last_docid"])

    # must_not blocks ride the same table with term index -1: zero
    # upper-bound contribution (they can only REMOVE candidates), but
    # present in the interval cover so the gather loop can decode them
    # lazily and mask their docids
    if gneg is not None and len(gneg):
        neg_rows: dict[str, list[tuple]] = {}
        for row in zip(gneg["term"], gneg["chunk"], gneg["first_docid"],
                       gneg["df"], gneg["blocks"], gneg["postings"]):
            neg_rows.setdefault(row[0], []).append(row)
        for t in sorted(neg_rows):
            for (_t, _chunk, first_docid, _df, blks, payload) in sorted(
                    neg_rows[t], key=lambda r: (int(r[2]), int(r[1]))):
                buf = np.frombuffer(payload, dtype=np.uint8)
                prev_last = int(first_docid) - 1
                for b in blks:
                    blocks.append((prev_last + 1, int(b["last_docid"]), 0.0,
                                   -1, buf, int(b["offset"]), 0))
                    prev_last = int(b["last_docid"])

    # drop blocks wholly outside the docid range, then build
    # elementary intervals at the surviving block ends
    blocks = [b for b in blocks if b[1] >= range_lo and b[0] <= range_hi]
    if not blocks:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int32"),
                             "docid": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    ends = np.unique(np.array([b[1] for b in blocks], dtype=np.int64))
    starts = np.concatenate(([0], ends[:-1] + 1))
    # upper bound per interval = sum of covering block bounds
    n_iv = ends.size
    ubs = np.zeros(n_iv, dtype=np.float64)
    cover: list[list[int]] = [[] for _ in range(n_iv)]
    for bi, (s, e, ub, ti, buf, off, _end) in enumerate(blocks):
        lo = np.searchsorted(ends, s, side="left")
        hi = np.searchsorted(ends, e, side="left")
        ubs[lo:hi + 1] += ub
        for iv in range(lo, hi + 1):
            cover[iv].append(bi)

    order = np.argsort(-ubs, kind="stable")
    heap: list[tuple[float, int]] = []  # (score, -docid) min-heap of top-k
    theta = -np.inf
    decoded_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    neg_cache: dict[int, np.ndarray] = {}   # must_not block docids
    ext_cache: dict[int, tuple[np.ndarray, int]] = {}  # prox: (tfs, pos_off)
    pos_cache: dict[int, np.ndarray] = {}   # prox: lazily decoded positions

    for iv in order:
        if len(heap) >= k and ubs[iv] < theta:
            break  # every remaining interval is strictly below the kth score
        if track_ti:
            cov = {blocks[b][3] for b in cover[iv]} - {-1}
            if must_ti is not None:
                # every must term has to cover the interval; should
                # coverage has to reach the should minimum
                if len(cov & must_ti) < n_must:
                    continue
                if min_match is not None and len(cov - must_ti) < min_match:
                    continue
            elif min_match is not None and len(cov) < min_match:
                continue  # fewer positive terms cover the interval than must match
        lo_d = max(int(starts[iv]), range_lo)
        hi_d = min(int(ends[iv]), range_hi)
        if lo_d > hi_d:
            continue
        # gather contributions per term in sorted-term order; must_not
        # blocks (ti = -1, sorted first) only collect exclusion docids
        per_term: list[tuple] = []
        excl: list[np.ndarray] = []
        for bi in sorted(cover[iv], key=lambda b: blocks[b][3]):
            s, e, ub, ti, buf, off, _end = blocks[bi]
            if ti < 0:
                if bi not in neg_cache:
                    neg_cache[bi] = decode_block(buf, off)[0]
                dneg = neg_cache[bi]
                mneg = (dneg >= lo_d) & (dneg <= hi_d)
                if mneg.any():
                    excl.append(dneg[mneg])
                continue
            if bi not in decoded_cache:
                if prox:
                    # ext variant records where the position stream
                    # starts; the stream itself decodes lazily, only
                    # for blocks whose docs survive the theta mask
                    d, t, l, pos_off = decode_block_ext(buf, off)
                    ext_cache[bi] = (t, pos_off)
                else:
                    d, t, l = decode_block(buf, off)
                decoded_cache[bi] = (d, idfs[terms[ti]] * _partial(t, l, avgdl))
            d, c = decoded_cache[bi]
            sel = (d >= lo_d) & (d <= hi_d)
            if sel.any():
                per_term.append((d[sel], c[sel], ti, bi, sel))
        if not per_term:
            continue
        alld = np.concatenate([p[0] for p in per_term])
        allc = np.concatenate([p[1] for p in per_term])
        uniq, inv = np.unique(alld, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, allc)  # adds in array order = sorted term order
        if must_ti is not None:
            # entries per doc per term ≤ 1, so clause-split bincounts
            # over the entry term-indexes count matched distinct terms
            allti = np.concatenate([np.full(p[0].size, p[2], dtype=np.int64)
                                    for p in per_term])
            mmask = np.isin(allti, np.fromiter(must_ti, dtype=np.int64,
                                               count=len(must_ti)))
            keep = np.bincount(inv[mmask], minlength=uniq.size) == n_must
            if min_match is not None:
                keep &= (np.bincount(inv[~mmask], minlength=uniq.size)
                         >= min_match)
            uniq, scores = uniq[keep], scores[keep]
            if uniq.size == 0:
                continue
        elif min_match is not None:
            # entries per doc = matched distinct terms (≤1 block/term/doc)
            keep = np.bincount(inv, minlength=uniq.size) >= min_match
            uniq, scores = uniq[keep], scores[keep]
            if uniq.size == 0:
                continue
        if excl:
            keep = ~np.isin(uniq, np.concatenate(excl))
            uniq, scores = uniq[keep], scores[keep]
            if uniq.size == 0:
                continue
        if dead is not None and dead.size:
            keep = ~np.isin(uniq, dead)
            if not keep.all():
                uniq, scores = uniq[keep], scores[keep]
                if uniq.size == 0:
                    continue
        if len(heap) >= k:
            # numpy-mask before the Python heap loop: a candidate with
            # score < theta can never enter the top-k — (sc, -d) < (theta,
            # -d0) whenever sc < theta, regardless of docid. Ties (sc ==
            # theta) MUST survive the mask: they can still win on the
            # docid tiebreak. Keeps the per-interval Python work
            # O(survivors), not O(interval size), on flat-score tails.
            # in proximity mode `scores` here are still the raw BM25
            # sums — upper bounds of the adjusted scores (factor ≤ 1),
            # so the mask keeps a superset and pruning stays exact
            keep = scores >= theta
            if not keep.all():
                uniq, scores = uniq[keep], scores[keep]
                if uniq.size == 0:
                    continue
        if prox and uniq.size:
            # positions ONLY for theta-surviving candidates: decode a
            # block's position stream at most once (pos_cache), slice
            # the interval's docs (sel), then the candidates' runs
            didx_l: list[np.ndarray] = []
            pos_l: list[np.ndarray] = []
            lab_l: list[np.ndarray] = []
            for (dsel, _c, ti2, bi2, sel2) in per_term:
                m = np.isin(dsel, uniq, assume_unique=True)
                if not m.any():
                    continue
                tf_full, pos_off2 = ext_cache[bi2]
                if bi2 not in pos_cache:
                    _s2, _e2, _ub2, _ti2, buf2, _off2, end2 = blocks[bi2]
                    pos_cache[bi2] = decode_positions_at(
                        buf2, pos_off2, tf_full, end=end2)
                pos_sel = pos_cache[bi2][np.repeat(sel2, tf_full)]
                tf_sel = tf_full[sel2]
                idx = np.searchsorted(uniq, dsel[m])
                didx_l.append(np.repeat(idx, tf_sel[m]))
                pos_l.append(pos_sel[np.repeat(m, tf_sel)])
                lab_l.append(np.full(int(tf_sel[m].sum()), ti2,
                                     dtype=np.int64))
            didx = np.concatenate(didx_l)
            posf = np.concatenate(pos_l).astype(np.int64)
            labf = np.concatenate(lab_l)
            order_d = np.argsort(didx, kind="stable")
            didx, posf, labf = didx[order_d], posf[order_d], labf[order_d]
            bounds = np.searchsorted(didx, np.arange(uniq.size + 1))
            widths = np.zeros(uniq.size, dtype=np.int64)
            for i in range(uniq.size):
                lo2, hi2 = int(bounds[i]), int(bounds[i + 1])
                if hi2 > lo2:
                    widths[i] = _min_window_flat(posf[lo2:hi2],
                                                 labf[lo2:hi2])
            scores = scores * (1.0 / (1.0 + widths.astype(np.float64)))
        for d, sc in zip(uniq.tolist(), scores.tolist()):
            item = (sc, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    theta = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                theta = heap[0][0]

    ranked = sorted(((sc, -nd) for sc, nd in heap), key=lambda x: (-x[0], x[1]))
    return pd.DataFrame({
        "query_id": qid,
        "rank": np.arange(1, len(ranked) + 1, dtype=np.int32),
        "docid": np.array([d for _, d in ranked], dtype=np.int64),
        "score": np.array([s for s, _ in ranked], dtype=np.float64),
    })


def _mq_term_map(mq: DataFrame | None) -> dict[int, set] | None:
    """Per-query analyzed must-term sets (driver-side, tiny — same
    cardinality class as the query term lists already collected);
    None when there is no must clause at all."""
    if mq is None:
        return None
    out: dict[int, set] = {}
    for r in mq.collect():
        out.setdefault(int(r["query_id"]), set()).add(r["term"])
    return out


def _qn_map(qterms: DataFrame) -> dict[int, int]:
    """|distinct analyzed terms| per query — the conjunctive target
    count (OOV terms included, so a must-clause on a missing term
    empties the result, exactly ES bool.must)."""
    rows = qterms.groupBy("query_id").agg(F.count("*").alias("qn")).collect()
    return {int(r["query_id"]): int(r["qn"]) for r in rows}


def _qterms_with_kinds(qterms: DataFrame, nq: DataFrame | None,
                       mq: DataFrame | None) -> DataFrame:
    """Union should/must/must_not (query_id, term) pairs into one
    joinable frame with a ``kind`` flag (0=should, 1=must, 2=must_not),
    deduplicated per (query, term) by max(kind): a term in both should
    and must counts (and scores) once as must; a term that is also
    excluded keeps only the exclusion — a must+must_not conflict then
    empties the query via the must count, exactly ES. Returns qterms
    unchanged (no kind column) when there are no bool clauses."""
    if nq is None and mq is None:
        return qterms
    out = qterms.withColumn("kind", F.lit(0))
    if mq is not None:
        out = out.unionByName(mq.withColumn("kind", F.lit(1)))
    if nq is not None:
        out = out.unionByName(nq.withColumn("kind", F.lit(2)))
    return out.groupBy("query_id", "term").agg(F.max("kind").alias("kind"))


def search_wand(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    require_all: bool = False,
    min_should_match: int | None = None,
    score_mode: str = "bm25",
) -> DataFrame:
    """Per-query exact top-k with block-max pruning; one applyInPandas
    group per query (ES-style shard fan-in happens inside the group —
    the gathered rows are already per-term encoded bytes, tiny relative
    to the corpus). ``require_all=True`` = conjunctive bool.must with
    mandatory-term interval skipping (see _wand_one_query) — the scale
    path for conjunctive queries; bit-identical to
    ``search_taat(require_all=True)`` (asserted in tests).
    ``min_should_match``, a ``neg_qtext`` column (bool.must_not), and a
    ``must_qtext`` column (mixed bool.must + optional should clauses)
    carry the remaining ES bool semantics — see search_taat; all three
    paths are bit-identical (asserted in tests).
    ``score_mode="proximity"``: opt-in position-window score weighting
    (contract in :func:`_wand_one_query`)."""
    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    _check_score_mode(score_mode)
    qa = _QueryAnalysis(spark, queries)
    terms, must_terms = qa.terms, qa.must_terms
    must_by_q = qa.must_term_map()
    _check_bool_args(require_all, min_should_match,
                     has_must=must_by_q is not None)
    if not terms and not must_terms:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    qterms_j = qa.kinds_df()
    all_terms = qa.all_terms
    seg = candidate_segments(spark, index_dir, all_terms)
    dfg = _dfg_or_none(spark, index_dir, all_terms, seg=seg, dead=dead)
    qn = qa.qn_map() if require_all else None

    seg_q = seg.join(F.broadcast(qterms_j), "term")

    def run(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
        if must_by_q is not None:
            mt = frozenset(must_by_q.get(int(key[0]), ()))
            return _wand_one_query(g, n_docs, avgdl, k, dfg,
                                   min_match=min_should_match,
                                   must_terms=mt, n_must=len(mt), dead=dead,
                                   score_mode=score_mode)
        mm = qn[int(key[0])] if qn is not None else min_should_match
        return _wand_one_query(g, n_docs, avgdl, k, dfg,
                               min_match=mm, dead=dead,
                               score_mode=score_mode)

    return seg_q.groupBy("query_id").applyInPandas(run, RESULT_SCHEMA)


def default_n_ranges(n_docs: int, target_docs_per_range: int = 1 << 22) -> int:
    """Size the chunk-parallel fan-out from corpus stats: ~4M docs per
    range keeps a range's decoded slice of a head posting list (≤ range
    width postings/term) comfortably inside one task's memory at any
    corpus size, capped at 512 groups per query."""
    return max(1, min(512, -(-n_docs // target_docs_per_range)))


def search_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    n_ranges: int | None = None,
    require_all: bool = False,
    min_should_match: int | None = None,
    score_mode: str = "bm25",
) -> DataFrame:
    """THE default query path. Derives the chunk-parallel fan-out from
    the index stats and dispatches: one range → single-group WAND (small
    index fast path, no merge stage); otherwise chunk-parallel WAND over
    docid ranges (no task ever holds a full head posting list).
    ``require_all=True`` routes conjunctive (ES bool.must) semantics
    through the same WAND paths; ``min_should_match`` and a
    ``neg_qtext`` queries column (bool.must_not) complete the ES bool
    query surface (see search_taat)."""
    n_docs, _, _ = load_stats_multi(_as_dirs(index_dir))
    nr = n_ranges if n_ranges is not None else default_n_ranges(n_docs)
    if nr <= 1:
        return search_wand(spark, index_dir, queries, k=k, require_all=require_all,
                           min_should_match=min_should_match,
                           score_mode=score_mode)
    return search_wand_ranges(spark, index_dir, queries, k=k, n_ranges=nr,
                              require_all=require_all,
                              min_should_match=min_should_match,
                              score_mode=score_mode)


def search_wand_ranges(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    n_ranges: int = 8,
    require_all: bool = False,
    min_should_match: int | None = None,
    score_mode: str = "bm25",
) -> DataFrame:
    """Chunk-parallel exact WAND — the 10^12-scale query path.

    The docid space is cut into ``n_ranges`` fixed global ranges; each
    (query, range) pair is an independent applyInPandas group running
    range-restricted block-max WAND (a head term's chunk rows scatter
    across groups, so no single task ever holds a full head posting
    list), then per-range candidates are merged with the Q6 window
    (candidates ≤ n_ranges·k per query). Exact: every doc's docid lies
    in exactly one range and all its term rows whose docid span covers
    it are present in that range's group.
    """
    from pyspark.sql.window import Window

    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    _check_score_mode(score_mode)
    qa = _QueryAnalysis(spark, queries)
    terms, must_terms = qa.terms, qa.must_terms
    must_by_q = qa.must_term_map()
    _check_bool_args(require_all, min_should_match,
                     has_must=must_by_q is not None)
    if not terms and not must_terms:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    qterms_j = qa.kinds_df()
    all_terms = qa.all_terms
    seg = candidate_segments(spark, index_dir, all_terms)
    dfg = _dfg_or_none(spark, index_dir, all_terms, seg=seg, dead=dead)
    qn = qa.qn_map() if require_all else None
    seg = seg.withColumn("__max_docid", F.element_at("blocks", -1)["last_docid"])
    seg_q = seg.join(F.broadcast(qterms_j), "term")

    # range bounds from the ACTUAL docid domain (per-dir docid_offset +
    # N), not [0, n_docs): a delta index queried alone has all docids
    # ≥ its offset, which [0, n_docs) would silently miss entirely
    dom_lo, dom_hi = docid_domain(_as_dirs(index_dir))
    if dom_hi < dom_lo:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    width = max(1, (dom_hi - dom_lo + 1 + n_ranges - 1) // n_ranges)
    ranges = local_df(
        spark,
        [(r, dom_lo + r * width, dom_lo + (r + 1) * width - 1)
         for r in range(n_ranges)],
        "rng int, lo long, hi long")
    # a row joins exactly the ranges its TRUE docid span
    # [first_docid, __max_docid] intersects — both bounds are needed:
    # without the low side, a tail term whose postings sit late in the
    # docid space is copied into every earlier range's group (~n_ranges/2
    # replication, ×512 at the fan-out cap) and decodes nothing there.
    # Exactness never depends on this pruning, only task size does: any
    # row holding a posting for a doc in [lo, hi] spans that doc's docid
    # and therefore joins the range.
    seg_r = seg_q.join(F.broadcast(ranges),
                       (F.col("__max_docid") >= F.col("lo"))
                       & (F.col("first_docid") <= F.col("hi")))

    def run(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
        if must_by_q is not None:
            mt = frozenset(must_by_q.get(int(key[0]), ()))
            return _wand_one_query(g, n_docs, avgdl, k, dfg,
                                   range_lo=int(g["lo"].iloc[0]),
                                   range_hi=int(g["hi"].iloc[0]),
                                   min_match=min_should_match,
                                   must_terms=mt, n_must=len(mt), dead=dead,
                                   score_mode=score_mode)
        mm = qn[int(key[0])] if qn is not None else min_should_match
        return _wand_one_query(g, n_docs, avgdl, k, dfg,
                               range_lo=int(g["lo"].iloc[0]),
                               range_hi=int(g["hi"].iloc[0]),
                               min_match=mm, dead=dead,
                               score_mode=score_mode)

    cands = seg_r.groupBy("query_id", "rng").applyInPandas(run, RESULT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


# ---------------------------------------------------------------------------
# Q8: phrase queries over positional postings (format v4)
# ---------------------------------------------------------------------------

def analyze_phrase_queries(queries: DataFrame) -> DataFrame:
    """(query_id, qtext) -> (query_id, qpos, term) — ORDERED and
    duplicate-keeping, unlike :func:`analyze_queries`: the phrase
    "the data the" is three constraints at offsets 0, 1, 2."""

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ex = pd.DataFrame({"query_id": pdf["query_id"],
                               "term": tokenize_series(pdf["qtext"])})
            ex = ex.explode("term", ignore_index=True).dropna(subset=["term"])
            if len(ex) == 0:
                continue
            ex["qpos"] = ex.groupby("query_id", sort=False).cumcount().astype(np.int32)
            yield ex[["query_id", "qpos", "term"]]

    return queries.mapInPandas(tok, schema="query_id long, qpos int, term string")


def _sloppy_match(phrase: list[tuple[int, str]],
                  per_term: dict[str, tuple], inter: np.ndarray,
                  slop: int,
                  want_width: bool = False) -> tuple[np.ndarray, np.ndarray | None]:
    """Local indexes (into ``inter``) of docs matching the phrase with
    ``slop`` (semantics in :func:`_phrase_one_query`), plus — when
    ``want_width`` — each matched doc's MINIMUM window width (max−min
    of the chosen adjusted positions over all valid assignments), the
    proximity-scoring signal; None otherwise. Returns
    ``(matched_local, widths | None)``.

    max−min of the chosen adjusted positions ≤ slop ⟺ they all fit in a
    window [w, w+slop], and WLOG w is one of the observed adjusted
    values — so the candidate window starts are the union of every
    constraint's (local_doc << 32 | adjusted) keys, and a window is
    feasible iff EVERY constraint has a key in [w, w+slop] for that doc
    (one vectorized searchsorted per constraint). Adjusted = pos − o +
    o_max keeps keys non-negative. Constraints sharing a term must then
    use DISTINCT raw positions — verified per (matched doc, window) by
    an exact greedy interval matching, only when the phrase actually
    repeats a term.

    Width exactness: for window start w, taking each constraint's FIRST
    key ≥ w minimizes the assignment's maximum; at w = (the optimal
    assignment's minimum value, itself an observed key) that greedy
    choice has min ≥ w and max ≤ the optimal max, so its width is ≤ —
    hence = — the optimum. min over feasible w is therefore the true
    minimum width, at zero extra searchsorted cost (the per-constraint
    first keys are already in hand)."""
    o_max = max(o for o, _ in phrase)
    keys_per_constraint: list[np.ndarray] = []
    for o, t in phrase:
        d, tf, _dl, pos = per_term[t]
        docc = np.repeat(d, tf)
        local = np.searchsorted(inter, docc).astype(np.int64)
        adj = pos.astype(np.int64) - o + o_max          # ≥ 0 (pos ≥ 0, o ≤ o_max)
        keys_per_constraint.append(np.unique((local << np.int64(32)) | adj))
    window_starts = np.unique(np.concatenate(keys_per_constraint))
    ok = np.ones(window_starts.size, dtype=bool)
    maxkv = window_starts.copy()        # running max of chosen (first) keys
    for keys in keys_per_constraint:
        idx = np.searchsorted(keys, window_starts, side="left")
        valid = idx < keys.size
        kv = keys[np.minimum(idx, keys.size - 1)]
        # first key ≥ w must be in the SAME doc and within w+slop (same
        # doc → the int64 difference is the pure adjusted-position gap)
        valid &= (kv >> np.int64(32)) == (window_starts >> np.int64(32))
        valid &= (kv - window_starts) <= slop
        ok &= valid
        if not ok.any():
            return np.empty(0, dtype=np.int64), (np.empty(0, dtype=np.int64)
                                                 if want_width else None)
        if want_width:
            np.maximum(maxkv, kv, out=maxkv, where=ok)
    feasible = window_starts[ok]
    matched_local = np.unique(feasible >> np.int64(32))

    # distinctness for repeated terms (rare): exact greedy interval
    # matching per (doc, feasible window) — intervals sorted by right
    # endpoint, each takes the smallest unused position; optimal for
    # same-length intervals with ascending endpoints.
    offsets_of: dict[str, list[int]] = {}
    for o, t in phrase:
        offsets_of.setdefault(t, []).append(o)
    rep_terms = {t: sorted(os_) for t, os_ in offsets_of.items() if len(os_) > 1}
    if not rep_terms:
        if not want_width:
            return matched_local, None
        # min over each doc's feasible windows of (max chosen − w)
        wdoc = feasible >> np.int64(32)
        wwid = (maxkv - window_starts)[ok]
        widths = np.full(matched_local.size, np.int64(slop), dtype=np.int64)
        np.minimum.at(widths, np.searchsorted(matched_local, wdoc), wwid)
        return matched_local, widths
    wdoc = feasible >> np.int64(32)
    wadj = feasible & np.int64(0xFFFFFFFF)
    keep: list[int] = []
    widths_l: list[int] = []
    single_keys = [(o, keys) for (o, _t), keys in zip(phrase, keys_per_constraint)
                   if _t not in rep_terms]
    for dl_ in matched_local.tolist():
        docid = int(inter[dl_])
        pos_of = {}
        for t in rep_terms:
            d, tf, _dl, pos = per_term[t]
            docc = np.repeat(d, tf)
            pos_of[t] = np.sort(pos[docc == docid].astype(np.int64))
        best_w: int | None = None
        for w in wadj[wdoc == dl_].tolist():
            all_ok = True
            chosen_min, chosen_max = None, None
            for t, offs in rep_terms.items():
                positions = pos_of[t]
                used = np.iinfo(np.int64).min
                for o in offs:
                    lo, hi = w - o_max + o, w - o_max + o + slop
                    i = int(np.searchsorted(positions, max(lo, used + 1), side="left"))
                    if i >= positions.size or positions[i] > hi:
                        all_ok = False
                        break
                    used = int(positions[i])
                    if want_width:
                        adj = used - o + o_max    # back to window coordinates
                        chosen_min = adj if chosen_min is None else min(chosen_min, adj)
                        chosen_max = adj if chosen_max is None else max(chosen_max, adj)
                if not all_ok:
                    break
            if all_ok and want_width:
                # non-repeated constraints: first key ≥ (doc, w), already
                # known feasible within [w, w+slop] from the window pass
                base = (np.int64(dl_) << np.int64(32)) | np.int64(w)
                for _o, keys in single_keys:
                    kv = int(keys[np.searchsorted(keys, base, side="left")])
                    adj = kv & 0xFFFFFFFF
                    chosen_min = adj if chosen_min is None else min(chosen_min, adj)
                    chosen_max = adj if chosen_max is None else max(chosen_max, adj)
                wd = int(chosen_max - chosen_min) if chosen_min is not None else 0
                best_w = wd if best_w is None else min(best_w, wd)
            elif all_ok:
                keep.append(dl_)
                break
        if want_width and best_w is not None:
            keep.append(dl_)
            widths_l.append(best_w)
    return (np.asarray(keep, dtype=np.int64),
            np.asarray(widths_l, dtype=np.int64) if want_width else None)



def _decode_candidate_positions(g: pd.DataFrame, required_terms: list[str],
                                range_lo: int = 0,
                                range_hi: int | None = None,
                                dead: np.ndarray | None = None,
                                optional_terms: tuple = (),
                                required_groups: list | None = None) -> tuple:
    """Shared two-pass positional decode for every positional kernel
    (phrase, sloppy phrase, phrase-prefix anchor side, span queries).

    PASS 1 decodes scoring streams only (``decode_block_ext`` never
    touches the position bytes, but records where they start), keeps
    per-term blocks overlapping [range_lo, range_hi], and intersects
    the REQUIRED terms' docids (rows/dirs are docid-disjoint so each
    term's docids are sorted unique after the ordered concat); dead
    docids drop from the intersection. PASS 2 decodes the position
    stream ONLY for blocks that still hold a candidate — picking it up
    at the byte offset pass 1 recorded, so scoring streams are never
    decoded twice — and keeps candidate docs' rows per term.

    ``optional_terms`` are decoded and candidate-restricted the same
    way but do NOT participate in the intersection and may be absent
    (span_not's exclude clause: needed for the overlap test, never a
    match requirement, never scored).

    ``required_groups`` (round 7d, the intervals query's any_of
    shape) replaces the flat required intersection with an
    intersection over GROUP UNIONS: a candidate doc needs at least one
    term of every group; a term — or even a whole block set — may be
    absent as long as its group is still covered. ``required_terms``
    must then be the flattened union (it still drives which terms
    decode).

    Returns ``(inter, per_term)`` — sorted candidate docids and
    ``term -> (docids, tfs, dls, flat_positions)`` (positions grouped
    by posting in docid order). ``inter`` is empty when no doc can
    match; ``per_term`` then is undefined."""
    none = (np.array([], dtype=np.int64), {})
    term_rows: dict[str, list[tuple]] = {}
    src_it = g["src_avgdl"] if "src_avgdl" in g.columns else [None] * len(g)
    for row in zip(g["term"], g["chunk"], g["first_docid"], g["blocks"],
                   g["postings"], src_it):
        term_rows.setdefault(row[0], []).append(row)
    if required_groups is None:
        if any(t not in term_rows for t in required_terms):
            return none  # a required term has no postings -> no match
        hard_required = set(required_terms)
    else:
        if any(all(t not in term_rows for t in grp)
               for grp in required_groups):
            return none  # an entire any_of group is absent -> no match
        hard_required = set()   # individual terms may be absent
    if range_hi is None:
        range_hi = np.iinfo(np.int64).max

    all_terms = list(required_terms) + [t for t in optional_terms
                                        if t in term_rows]
    per_term_blocks: dict[str, list[tuple]] = {}   # (d,tf,dl,buf,pos_off,sel,tf_full,blk_end)
    for t in all_terms:
        blocks = []
        for (_t, chunk, first, blks, payload, _src) in sorted(
                term_rows.get(t, []), key=lambda r: (int(r[2]), int(r[1]))):
            buf = np.frombuffer(payload, dtype=np.uint8)
            prev_last = int(first) - 1
            for bi, b in enumerate(blks):
                last = int(b["last_docid"])
                if last >= range_lo and prev_last + 1 <= range_hi:
                    d, tf, dl, pos_off = decode_block_ext(buf, int(b["offset"]))
                    sel = (d >= range_lo) & (d <= range_hi)
                    if sel.any():
                        # end bound = next block's offset (payload end for
                        # the last block) so pass 2's position decode is
                        # validated against the block boundary
                        blk_end = (int(blks[bi + 1]["offset"])
                                   if bi + 1 < len(blks) else buf.size)
                        blocks.append((d[sel], tf[sel], dl[sel], buf,
                                       pos_off, sel, tf, blk_end))
                prev_last = last
        if not blocks and t in hard_required:
            return none
        per_term_blocks[t] = blocks

    def _docids_of(t: str) -> np.ndarray:
        blks = per_term_blocks.get(t, [])
        if not blks:
            return np.array([], dtype=np.int64)
        return np.concatenate([b[0] for b in blks])

    inter = None
    groups = ([ [t] for t in required_terms ] if required_groups is None
              else required_groups)
    for grp in groups:
        if len(grp) == 1:
            td = _docids_of(grp[0])
        else:
            td = np.array([], dtype=np.int64)
            for t in grp:
                td = np.union1d(td, _docids_of(t))
        inter = td if inter is None else np.intersect1d(inter, td,
                                                        assume_unique=True)
        if inter.size == 0:
            return none
    if dead is not None and dead.size:
        inter = inter[~np.isin(inter, dead)]
    if inter.size == 0:
        return none

    per_term: dict[str, tuple] = {}
    for t in all_terms:
        ds, tfl, dll, pfl = [], [], [], []
        for (d, tf, dl, buf, pos_off, sel, tf_full, blk_end) in per_term_blocks[t]:
            keep = np.isin(d, inter, assume_unique=True)
            if not keep.any():
                continue
            pos = decode_positions_at(buf, pos_off, tf_full, end=blk_end)
            pos = pos[np.repeat(sel, tf_full)]    # range-restrict like pass 1
            ds.append(d[keep]); tfl.append(tf[keep]); dll.append(dl[keep])
            pfl.append(pos[np.repeat(keep, tf)])
        if not ds:
            if t in hard_required:
                return none
            continue  # absent optional/any_of term: simply no rows
        per_term[t] = (np.concatenate(ds), np.concatenate(tfl),
                       np.concatenate(dll), np.concatenate(pfl))
    return inter, per_term



def _exact_anchor_keys(phrase: list[tuple[int, str]], per_term: dict,
                       inter: np.ndarray) -> np.ndarray:
    """Exact-adjacency anchor intersection over every (offset, term)
    constraint of an analyzed phrase: returns the sorted int64 keys
    ``(local_docid << 32) | anchor_position`` of every document
    position where the exact sequence starts (local = index into the
    sorted candidate array ``inter`` — dense, so the composite can
    never overflow at 10^12-docid scale). Repeated terms need no
    distinctness check here — one anchor a serves offsets o≠o' with
    distinct positions a+o, a+o' automatically. Empty when no doc
    holds the sequence."""
    anchors: np.ndarray | None = None
    for o, t in phrase:
        d, tf, _dl, pos = per_term[t]
        docc = np.repeat(d, tf)
        keep = pos >= o                      # docc ⊆ inter by pass 2
        if not keep.any():
            return np.array([], dtype=np.int64)
        local = np.searchsorted(inter, docc[keep]).astype(np.int64)
        key = (local << np.int64(32)) | (pos[keep].astype(np.int64) - o)
        key = np.unique(key)
        anchors = key if anchors is None else np.intersect1d(
            anchors, key, assume_unique=True)
        if anchors.size == 0:
            return anchors
    return anchors


def _phrase_one_query(g: pd.DataFrame, phrase: list[tuple[int, str]],
                      n_docs: int, avgdl: float, k: int, dfg: dict,
                      range_lo: int = 0, range_hi: int | None = None,
                      dead: np.ndarray | None = None,
                      slop: int = 0,
                      score_mode: str = "bm25") -> pd.DataFrame:
    """match_phrase (+ slop) + BM25 top-k over one query's candidate rows.

    Semantics (documented contract, ES match_phrase parity on the
    filter side):

    - ``slop=0`` (exact): a doc matches iff the exact token sequence
      occurs — for every (offset o, term t) of the analyzed phrase
      there is one anchor position a with a+o ∈ positions(doc, t).
    - ``slop=s`` (proximity, ES match_phrase ``slop`` / Lucene sloppy
      phrase): a doc matches iff one document position can be chosen
      per phrase constraint — DISTINCT positions for constraints
      sharing a term (a token occupies one position) — such that every
      pairwise displacement |(p_i − o_i) − (p_j − o_j)| ≤ s;
      equivalently max−min of the adjusted positions ≤ s. This is the
      adjusted-position window Lucene's SloppyPhraseScorer accepts
      (transposed terms match at slop 2, per the ES docs), and it is
      exactly SQL-expressible (pairwise range predicates), which keeps
      the DuckDB twin exact-by-construction.

    Matching docs are ranked by the standard disjunctive BM25 sum over
    the phrase's DISTINCT terms (frozen fold order §1.3.4) — the score
    set is a subset of the disjunctive scorer's, so the DuckDB twin is
    the disjunctive oracle restricted to matching docs.

    ``score_mode="proximity"`` (opt-in, round 6): multiply each matched
    doc's BM25 sum by 1/(1 + min_window_width), where min_window_width
    is the smallest max−min of chosen adjusted positions over all valid
    (distinct-position) assignments — 1.0 for an in-order exact match,
    decaying as the best match spreads out. The ES/Lucene analogue is
    SloppyPhraseScorer's 1/(1+matchLength) slop factor; this contract
    (best match only, not summed over matches) is simpler, documented,
    and pinned against a brute-force oracle in tests. The default
    ("bm25") is unchanged — existing driver entries stay bit-stable.

    Vectorized end to end: anchors/window-starts are intersected as
    (local_doc_id << 32 | shifted position) int64 keys — local dense
    doc ids (not raw docids) so the composite can never overflow at
    10^12-docid scale; the per-doc Python fallback runs ONLY for the
    rare repeated-term sloppy phrase, on already-matched docs.
    """
    from ..scoring import partial as _partial

    empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="int32"),
                          "docid": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if range_hi is None:
        range_hi = np.iinfo(np.int64).max
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    distinct_terms = sorted({t for _, t in phrase})
    inter, per_term = _decode_candidate_positions(
        g, distinct_terms, range_lo, range_hi, dead)
    if inter.size == 0:
        return empty

    if slop <= 0:
        anchors = _exact_anchor_keys(phrase, per_term, inter)
        if anchors.size == 0:
            return empty
        matched_local = np.unique(anchors >> np.int64(32))
        widths = None
    else:
        matched_local, widths = _sloppy_match(
            phrase, per_term, inter, slop,
            want_width=(score_mode == "proximity"))
        if matched_local.size == 0:
            return empty
    matched = inter[matched_local]

    # BM25 over the distinct phrase terms, sorted-term fold order
    scores = np.zeros(matched.size, dtype=np.float64)
    for t in distinct_terms:
        d, tf, dl, _pos = per_term[t]
        sel = np.isin(d, matched, assume_unique=True)
        idx = np.searchsorted(matched, d[sel])
        scores[idx] += _idf(float(dfg[t]), n_docs) * _partial(tf[sel], dl[sel], avgdl)
    if score_mode == "proximity" and widths is not None:
        scores *= 1.0 / (1.0 + widths.astype(np.float64))

    order = np.lexsort((matched, -scores))[:k]
    return pd.DataFrame({
        "query_id": qid,
        "rank": np.arange(1, order.size + 1, dtype=np.int32),
        "docid": matched[order],
        "score": scores[order],
    })


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    n_ranges: int | None = None,
    slop: int = 0,
    score_mode: str = "bm25",
) -> DataFrame:
    """Phrase top-k (ES match_phrase parity, incl. ``slop`` proximity —
    semantics in :func:`_phrase_one_query`; ``score_mode="proximity"``
    additionally weights scores by 1/(1+min window width), closest
    match first) over the positional index.
    Dispatches like :func:`search_topk`: small index -> one
    applyInPandas group per query; large -> chunk-parallel groups over
    fixed docid ranges (exact: a doc's anchors/windows are evaluated
    entirely inside the one range that contains its docid, and every
    term row whose span covers that docid joins the range)."""
    from pyspark.sql.window import Window

    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    # per-query (qpos, term) structure, driver-side (tiny): the same
    # frozen tokenizer as analyze_phrase_queries, ordered and
    # duplicate-keeping, without the mapInPandas+collect job
    qp = queries.select("query_id", "qtext").toPandas()
    phrases: dict[int, list[tuple[int, str]]] = {}
    for qid_, qtext_ in zip(qp["query_id"], qp["qtext"]):
        if qtext_ is None:
            continue
        toks = tokenize(qtext_)
        if toks:
            lst = phrases.setdefault(int(qid_), [])
            base = len(lst)
            lst.extend((base + i, t) for i, t in enumerate(toks))
    terms = sorted({t for p in phrases.values() for _, t in p})
    if not terms:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    seg = candidate_segments(spark, index_dir, terms)
    dfg = _dfg_or_none(spark, index_dir, terms, seg=seg, dead=dead)
    qdist = local_df(
        spark,
        [(qid, t) for qid, p in phrases.items() for t in {t for _, t in p}],
        "query_id long, term string")

    nr = n_ranges if n_ranges is not None else default_n_ranges(n_docs)
    if nr <= 1:
        seg_q = seg.join(F.broadcast(qdist), "term")

        def run(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
            return _phrase_one_query(g, phrases[int(key[0])], n_docs, avgdl,
                                     k, dfg, dead=dead, slop=slop,
                                     score_mode=score_mode)

        return seg_q.groupBy("query_id").applyInPandas(run, RESULT_SCHEMA)

    dom_lo, dom_hi = docid_domain(_as_dirs(index_dir))
    if dom_hi < dom_lo:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    width = max(1, (dom_hi - dom_lo + 1 + nr - 1) // nr)
    ranges = local_df(
        spark,
        [(r, dom_lo + r * width, dom_lo + (r + 1) * width - 1) for r in range(nr)],
        "rng int, lo long, hi long")
    seg2 = seg.withColumn("__max_docid", F.element_at("blocks", -1)["last_docid"])
    seg_r = (seg2.join(F.broadcast(qdist), "term")
             .join(F.broadcast(ranges),
                   (F.col("__max_docid") >= F.col("lo"))
                   & (F.col("first_docid") <= F.col("hi"))))

    def run_rng(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
        return _phrase_one_query(g, phrases[int(key[0])], n_docs, avgdl, k, dfg,
                                 range_lo=int(g["lo"].iloc[0]),
                                 range_hi=int(g["hi"].iloc[0]), dead=dead,
                                 slop=slop, score_mode=score_mode)

    cands = seg_r.groupBy("query_id", "rng").applyInPandas(run_rng, RESULT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


# ---------------------------------------------------------------------------
# Q12: prefix (wildcard `pre*`) term queries — ES query_string prefix
# ---------------------------------------------------------------------------

MAX_PREFIX_EXPANSIONS = 1024


def _prefix_hi(prefix: str) -> str:
    """Exclusive upper bound of the prefix's term range: bump the last
    char (terms are [a-z0-9]+, so +1 of the last code point is safe)."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def _expand_dict_terms(spark: SparkSession, index_dir, cond,
                       cap: int) -> list[str]:
    """Shared dictionary-expansion kernel for every term-rewrite query
    (prefix / fuzzy / wildcard / regexp): scan each chain dir's term
    dictionary under ``cond`` (a Column predicate — range conditions
    push to the parquet scan, the dictionary is written term-SORTED so
    row-group min/max stats prune), sum df across dirs, cap at ``cap``
    by df desc / term asc — the deterministic analog of ES's rewrite
    cap (``indices.query.bool.max_clause_count``)."""
    dirs = _as_dirs(index_dir)
    dic = None
    for d in dirs:
        piece = (read_dictionary(spark, d)
                 .select("term", "df").filter(cond))
        dic = piece if dic is None else dic.unionByName(piece)
    rows = (dic.groupBy("term").agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(int(cap)).collect())
    return sorted(r["term"] for r in rows)


def expand_prefix_terms(spark: SparkSession, index_dir, prefix: str,
                        cap: int = MAX_PREFIX_EXPANSIONS) -> list[str]:
    """Dictionary range scan ``term >= p AND term < p⊕1`` (pushed to the
    parquet scan; the dictionary is written term-SORTED so row-group
    min/max stats prune everything outside the range) → matching terms,
    capped at ``cap`` by df desc / term asc — the deterministic analog
    of ES's rewrite cap (``indices.query.bool.max_clause_count``).
    Multi-dir chains sum df across dirs before the cap."""
    p = prefix.strip().lower()
    if not p or not all("a" <= c <= "z" or "0" <= c <= "9" for c in p):
        raise ValueError(f"prefix must be a non-empty [a-z0-9]+ string, "
                         f"got {prefix!r}")
    rng = (F.col("term") >= p) & (F.col("term") < _prefix_hi(p))
    return _expand_dict_terms(spark, index_dir, rng, cap)


def search_prefix(spark: SparkSession, index_dir, queries: DataFrame,
                  k: int = TOP_K, cap: int = MAX_PREFIX_EXPANSIONS,
                  n_ranges: int | None = None) -> DataFrame:
    """BM25 top-k for prefix queries: each row of ``queries`` is
    (query_id, prefix); the prefix expands against the term dictionary
    (range pushdown, df-capped) and the expanded disjunction runs
    through the standard engine path (``search_topk`` — WAND pruning,
    chunk-parallel above the fan-out threshold).

    Scoring is ES ``rewrite=scoring_boolean``: expanded terms score as
    a normal BM25 disjunction (each with its own idf). ES's default
    ``constant_score`` rewrite is a deliberate non-goal — it discards
    ranking information and its "score" is just the boost; the
    scoring rewrite is the one with verifiable semantics.

    Driver-side work is one tiny dictionary-range job per distinct
    prefix (queries per call are human-scale); everything heavy stays
    in the engine path."""
    qrows = queries.select("query_id", "prefix").collect()
    expanded = [(int(r["query_id"]),
                 " ".join(expand_prefix_terms(spark, index_dir,
                                              r["prefix"], cap)))
                for r in qrows]
    qdf = local_df(spark, expanded, "query_id long, qtext string")
    return search_topk(spark, index_dir, qdf, k=k, n_ranges=n_ranges)


# ---------------------------------------------------------------------------
# Q13: fuzzy term queries (ES query_string `word~N`)
# ---------------------------------------------------------------------------

def expand_fuzzy_terms(spark: SparkSession, index_dir, term: str,
                       max_edits: int = 2,
                       cap: int = MAX_PREFIX_EXPANSIONS) -> list[str]:
    """Dictionary scan for terms within ``max_edits`` Levenshtein
    distance of ``term`` (distance 0 = the term itself included, as in
    Lucene). The distance filter is the JVM built-in ``levenshtein`` —
    a full |vocabulary| scan like Lucene's FST automaton walk, over the
    engine's smallest table; capped by df desc / term asc like the
    prefix rewrite."""
    t = term.strip().lower()
    if not t or not all("a" <= c <= "z" or "0" <= c <= "9" for c in t):
        raise ValueError(f"fuzzy term must be a non-empty [a-z0-9]+ string, "
                         f"got {term!r}")
    if max_edits not in (0, 1, 2):
        raise ValueError("max_edits must be 0, 1 or 2 (ES fuzziness)")
    # cheap length pre-filter IS pushable; levenshtein isn't
    cond = ((F.length("term") >= len(t) - max_edits)
            & (F.length("term") <= len(t) + max_edits)
            & (F.levenshtein(F.col("term"), F.lit(t)) <= max_edits))
    return _expand_dict_terms(spark, index_dir, cond, cap)


def search_fuzzy(spark: SparkSession, index_dir, queries: DataFrame,
                 k: int = TOP_K, max_edits: int = 2,
                 cap: int = MAX_PREFIX_EXPANSIONS,
                 n_ranges: int | None = None) -> DataFrame:
    """BM25 top-k for single-term fuzzy queries: each row of
    ``queries`` is (query_id, fterm); the term expands against the
    dictionary within ``max_edits`` and the expansion scores as a
    normal BM25 disjunction through the standard engine path
    (rewrite=scoring_boolean — same declared choice as
    :func:`search_prefix`)."""
    qrows = queries.select("query_id", "fterm").collect()
    expanded = [(int(r["query_id"]),
                 " ".join(expand_fuzzy_terms(spark, index_dir, r["fterm"],
                                             max_edits, cap)))
                for r in qrows]
    qdf = local_df(spark, expanded, "query_id long, qtext string")
    return search_topk(spark, index_dir, qdf, k=k, n_ranges=n_ranges)


# ---------------------------------------------------------------------------
# Q14: match_phrase_prefix (ES search-as-you-type phrase + trailing prefix)
# ---------------------------------------------------------------------------

MAX_PHRASE_PREFIX_EXPANSIONS = 50   # ES match_phrase_prefix max_expansions


def _phrase_prefix_one_query(g: pd.DataFrame, fixed: list[str],
                             expansions: list[str],
                             n_docs: int, avgdl: float, k: int, dfg: dict,
                             range_lo: int = 0, range_hi: int | None = None,
                             dead: np.ndarray | None = None) -> pd.DataFrame:
    """match_phrase_prefix top-k over one query's candidate rows.

    Documented contract (ES parity on the filter side): the analyzed
    phrase is ``fixed + [prefix]``; the trailing prefix was expanded
    against the term dictionary into ``expansions`` (df-desc-capped,
    the same deterministic rewrite cap as Q12). A doc matches iff the
    exact token sequence ``fixed + [e]`` occurs for SOME expansion e
    (slop is a declared non-goal — ES's default slop 0). Matching docs
    are ranked by the disjunctive BM25 sum over the sorted distinct
    union of the FIXED terms and the expansions that complete the
    phrase in THAT doc (each term once — an expansion equal to a fixed
    term does not double-count), the exactly-SQL-expressible analog of
    Lucene's MultiPhraseQuery scoring.

    Same two-pass structure as :func:`_phrase_one_query`: pass 1
    decodes only the scoring streams and intersects docids; pass 2
    pays for position bytes only in blocks still holding candidates.
    """
    from ..scoring import partial as _partial

    empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="int32"),
                          "docid": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if range_hi is None:
        range_hi = np.iinfo(np.int64).max
    dfg = _dfg_from_rows(g, dfg)
    qid = int(g["query_id"].iloc[0])
    fixed_terms = sorted(set(fixed))
    term_rows: dict[str, list[tuple]] = {}
    for row in zip(g["term"], g["chunk"], g["first_docid"], g["blocks"],
                   g["postings"]):
        term_rows.setdefault(row[0], []).append(row)
    if any(t not in term_rows for t in fixed_terms):
        return empty  # a required fixed term has no postings here
    exp_here = [e for e in expansions if e in term_rows]
    if not exp_here:
        return empty  # no expansion has postings -> nothing completes

    # PASS 1 — scoring streams only
    per_term_blocks: dict[str, list[tuple]] = {}
    for t in fixed_terms + [e for e in exp_here if e not in fixed_terms]:
        blocks = []
        for (_t, chunk, first, blks, payload) in sorted(
                term_rows[t], key=lambda r: (int(r[2]), int(r[1]))):
            buf = np.frombuffer(payload, dtype=np.uint8)
            prev_last = int(first) - 1
            for bi, b in enumerate(blks):
                last = int(b["last_docid"])
                if last >= range_lo and prev_last + 1 <= range_hi:
                    d, tf, dl, pos_off = decode_block_ext(buf, int(b["offset"]))
                    sel = (d >= range_lo) & (d <= range_hi)
                    if sel.any():
                        blk_end = (int(blks[bi + 1]["offset"])
                                   if bi + 1 < len(blks) else buf.size)
                        blocks.append((d[sel], tf[sel], dl[sel], buf,
                                       pos_off, sel, tf, blk_end))
                prev_last = last
        if blocks:
            per_term_blocks[t] = blocks
        elif t in fixed_terms:
            return empty

    inter = None
    for t in fixed_terms:
        td = np.concatenate([b[0] for b in per_term_blocks[t]])
        inter = td if inter is None else np.intersect1d(inter, td,
                                                        assume_unique=True)
        if inter.size == 0:
            return empty
    exp_union_l = [np.concatenate([b[0] for b in per_term_blocks[e]])
                   for e in exp_here if e in per_term_blocks]
    if not exp_union_l:
        return empty
    exp_union = np.unique(np.concatenate(exp_union_l))
    inter = exp_union if inter is None else np.intersect1d(
        inter, exp_union, assume_unique=True)
    if dead is not None and dead.size:
        inter = inter[~np.isin(inter, dead)]
    if inter.size == 0:
        return empty

    # PASS 2 — positions only for blocks still holding candidates
    per_term: dict[str, tuple] = {}
    for t, blocks in per_term_blocks.items():
        ds, tfl, dll, pfl = [], [], [], []
        for (d, tf, dl, buf, pos_off, sel, tf_full, blk_end) in blocks:
            keep = np.isin(d, inter, assume_unique=True)
            if not keep.any():
                continue
            pos = decode_positions_at(buf, pos_off, tf_full, end=blk_end)
            pos = pos[np.repeat(sel, tf_full)]
            ds.append(d[keep]); tfl.append(tf[keep]); dll.append(dl[keep])
            pfl.append(pos[np.repeat(keep, tf)])
        if ds:
            per_term[t] = (np.concatenate(ds), np.concatenate(tfl),
                           np.concatenate(dll), np.concatenate(pfl))
    if any(t not in per_term for t in fixed_terms):
        return empty

    # anchors over the FIXED constraints (offsets 0..n_fixed-1), exactly
    # the exact-phrase anchor intersection
    anchors: np.ndarray | None = None
    for o, t in enumerate(fixed):
        d, tf, _dl, pos = per_term[t]
        docc = np.repeat(d, tf)
        keep = pos >= o
        if not keep.any():
            return empty
        local = np.searchsorted(inter, docc[keep]).astype(np.int64)
        key = (local << np.int64(32)) | (pos[keep].astype(np.int64) - o)
        key = np.unique(key)
        anchors = key if anchors is None else np.intersect1d(
            anchors, key, assume_unique=True)
        if anchors.size == 0:
            return empty

    # the trailing slot: an anchor completes iff SOME expansion sits at
    # offset len(fixed); collect (doc, expansion) pairs for scoring
    o_last = len(fixed)
    matched_local: np.ndarray | None = None
    docs_by_exp: dict[str, np.ndarray] = {}
    for e in exp_here:
        if e not in per_term:
            continue
        d, tf, _dl, pos = per_term[e]
        docc = np.repeat(d, tf)
        keep = pos >= o_last
        if not keep.any():
            continue
        local = np.searchsorted(inter, docc[keep]).astype(np.int64)
        key = np.unique((local << np.int64(32))
                        | (pos[keep].astype(np.int64) - o_last))
        hit = key if anchors is None else np.intersect1d(
            anchors, key, assume_unique=True)
        if hit.size == 0:
            continue
        dloc = np.unique(hit >> np.int64(32))
        docs_by_exp[e] = inter[dloc]
        matched_local = dloc if matched_local is None else np.union1d(
            matched_local, dloc)
    if matched_local is None or matched_local.size == 0:
        return empty
    matched = inter[matched_local]

    # BM25 over sorted distinct (fixed ∪ per-doc matched expansions)
    scores = np.zeros(matched.size, dtype=np.float64)
    for t in sorted(set(fixed_terms) | set(docs_by_exp)):
        d, tf, dl, _pos = per_term[t]
        if t in fixed_terms:
            tgt = matched            # fixed terms score on every match
        else:
            tgt = docs_by_exp[t]     # expansions only where they complete
        sel = np.isin(d, tgt, assume_unique=True)
        if not sel.any():
            continue
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


def search_phrase_prefix(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
    n_ranges: int | None = None,
    max_expansions: int = MAX_PHRASE_PREFIX_EXPANSIONS,
) -> DataFrame:
    """ES ``match_phrase_prefix`` top-k: the query text analyzes to a
    phrase whose LAST token is a prefix; the prefix expands against the
    term dictionary (range-pushdown scan, df-desc cap ``max_expansions``
    — ES default 50) and a doc matches iff the exact sequence
    ``fixed + [e]`` occurs for some expansion e. Ranking contract in
    :func:`_phrase_prefix_one_query`. Dispatches like
    :func:`search_phrase`: single applyInPandas group per query on a
    small index, chunk-parallel docid ranges on a large one (exact —
    a doc's anchors are evaluated inside its one range)."""
    from pyspark.sql.window import Window

    n_docs, avgdl, _, dead = _chain_stats(spark, index_dir)
    qp = queries.select("query_id", "qtext").toPandas()
    phrases: dict[int, list[str]] = {}
    for qid_, qtext_ in zip(qp["query_id"], qp["qtext"]):
        if qtext_ is None:
            continue
        toks = tokenize(qtext_)
        if toks:
            phrases.setdefault(int(qid_), []).extend(toks)
    plans: dict[int, tuple[list[str], list[str]]] = {}
    for qid, toks in phrases.items():
        fixed, prefix = toks[:-1], toks[-1]
        plans[qid] = (fixed,
                      expand_prefix_terms(spark, index_dir, prefix,
                                          cap=max_expansions))
    all_terms = sorted({t for fixed, exps in plans.values()
                        for t in (*fixed, *exps)})
    if not all_terms:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    seg = candidate_segments(spark, index_dir, all_terms)
    dfg = _dfg_or_none(spark, index_dir, all_terms, seg=seg, dead=dead)
    qdist = local_df(
        spark,
        [(qid, t) for qid, (fixed, exps) in plans.items()
         for t in sorted(set(fixed) | set(exps))],
        "query_id long, term string")

    nr = n_ranges if n_ranges is not None else default_n_ranges(n_docs)
    if nr <= 1:
        seg_q = seg.join(F.broadcast(qdist), "term")

        def run(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
            fixed, exps = plans[int(key[0])]
            return _phrase_prefix_one_query(g, fixed, exps, n_docs, avgdl,
                                            k, dfg, dead=dead)

        return seg_q.groupBy("query_id").applyInPandas(run, RESULT_SCHEMA)

    dom_lo, dom_hi = docid_domain(_as_dirs(index_dir))
    if dom_hi < dom_lo:
        return spark.createDataFrame([], schema=RESULT_SCHEMA)
    width = max(1, (dom_hi - dom_lo + 1 + nr - 1) // nr)
    ranges = local_df(
        spark,
        [(r, dom_lo + r * width, dom_lo + (r + 1) * width - 1)
         for r in range(nr)],
        "rng int, lo long, hi long")
    seg2 = seg.withColumn("__max_docid",
                          F.element_at("blocks", -1)["last_docid"])
    seg_r = (seg2.join(F.broadcast(qdist), "term")
             .join(F.broadcast(ranges),
                   (F.col("__max_docid") >= F.col("lo"))
                   & (F.col("first_docid") <= F.col("hi"))))

    def run_rng(key: tuple, g: pd.DataFrame) -> pd.DataFrame:
        fixed, exps = plans[int(key[0])]
        return _phrase_prefix_one_query(g, fixed, exps, n_docs, avgdl, k,
                                        dfg,
                                        range_lo=int(g["lo"].iloc[0]),
                                        range_hi=int(g["hi"].iloc[0]),
                                        dead=dead)

    cands = seg_r.groupBy("query_id", "rng").applyInPandas(run_rng,
                                                           RESULT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "docid", "score"))


# ---------------------------------------------------------------------------
# Q15: wildcard term queries (ES `wildcard` / query_string `wi*d`, `w?rd`)
# Q16: regexp term queries (ES `regexp` / query_string /pattern/)
# ---------------------------------------------------------------------------

_TERM_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"


def _wildcard_literal_prefix(pattern: str) -> str:
    """Literal chars before the first `*`/`?` — the pushable term range."""
    i = 0
    while i < len(pattern) and pattern[i] not in "*?":
        i += 1
    return pattern[:i]


def expand_wildcard_terms(spark: SparkSession, index_dir, pattern: str,
                          cap: int = MAX_PREFIX_EXPANSIONS) -> list[str]:
    """Dictionary expansion for an ES ``wildcard`` pattern over the
    [a-z0-9] term alphabet: ``*`` matches any run (incl. empty), ``?``
    exactly one char. The scan predicate is the JVM ``LIKE`` translation
    (``*``→``%``, ``?``→``_`` — no escaping needed, the validated
    alphabet contains neither ``%`` nor ``_``); any literal prefix
    before the first wildcard additionally pushes a term range to the
    parquet scan, so `pre*`-shaped patterns prune row groups exactly
    like Q12 prefixes, while leading-wildcard patterns degrade to the
    full (still smallest-table) dictionary scan — the same cost shape
    Lucene documents for its wildcard automata."""
    p = pattern.strip().lower()
    if not p or any(c not in _TERM_CHARS + "*?" for c in p):
        raise ValueError(f"wildcard pattern must be a non-empty "
                         f"[a-z0-9*?]+ string, got {pattern!r}")
    if all(c in "*?" for c in p):
        raise ValueError("wildcard pattern needs >=1 literal character "
                         f"(ES rejects pure-wildcard too), got {pattern!r}")
    like = p.replace("*", "%").replace("?", "_")
    cond = F.col("term").like(like)
    pfx = _wildcard_literal_prefix(p)
    if pfx:
        cond = ((F.col("term") >= pfx)
                & (F.col("term") < _prefix_hi(pfx)) & cond)
    return _expand_dict_terms(spark, index_dir, cond, cap)


def search_wildcard(spark: SparkSession, index_dir, queries: DataFrame,
                    k: int = TOP_K, cap: int = MAX_PREFIX_EXPANSIONS,
                    n_ranges: int | None = None) -> DataFrame:
    """BM25 top-k for wildcard term queries: each row of ``queries`` is
    (query_id, wpattern); the pattern expands against the dictionary
    (:func:`expand_wildcard_terms`) and the expansion scores as a
    normal BM25 disjunction through the standard engine path
    (rewrite=scoring_boolean — the same declared choice as
    :func:`search_prefix`; ES's constant_score rewrite discards
    ranking information)."""
    qrows = queries.select("query_id", "wpattern").collect()
    expanded = [(int(r["query_id"]),
                 " ".join(expand_wildcard_terms(spark, index_dir,
                                                r["wpattern"], cap)))
                for r in qrows]
    qdf = local_df(spark, expanded, "query_id long, qtext string")
    return search_topk(spark, index_dir, qdf, k=k, n_ranges=n_ranges)


def _regex_literal_prefix(p: str) -> str:
    """Mandatory literal prefix of a regex, for term-range pushdown.

    Conservative by construction: a top-level alternation or any
    backslash escape disables the prefix entirely; otherwise the prefix
    is the leading run of plain [a-z0-9] literals, minus the last one
    if a quantifier (``* ? + {``) makes it optional/repeatable. A
    shorter-than-possible prefix only costs pruning, never correctness
    — the anchored regex itself is re-checked on every scanned term."""
    if "\\" in p:
        return ""
    depth = 0
    for c in p:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return ""
    i = 0
    while i < len(p) and p[i] in _TERM_CHARS:
        i += 1
    if i < len(p) and p[i] in "*?+{":
        i -= 1
    return p[:max(i, 0)]


def expand_regexp_terms(spark: SparkSession, index_dir, pattern: str,
                        cap: int = MAX_PREFIX_EXPANSIONS) -> list[str]:
    """Dictionary expansion for an ES ``regexp`` term query. Matching is
    whole-term (Lucene regexps are implicitly anchored): the scan
    predicate is JVM ``RLIKE '^(?:pattern)$'``. Patterns must stay in
    the Java-regex subset (validated driver-side with ``re.compile`` to
    fail fast; the harness twin additionally pins the tested subset to
    RE2-compatible syntax). A mandatory literal prefix, when one can be
    proven (:func:`_regex_literal_prefix`), pushes a term range to the
    parquet scan like Q12/Q15."""
    p = pattern.strip().lower()
    if not p:
        raise ValueError("regexp pattern must be non-empty")
    try:
        re.compile(p)
    except re.error as e:
        raise ValueError(f"invalid regexp pattern {pattern!r}: {e}") from e
    cond = F.col("term").rlike(f"^(?:{p})$")
    pfx = _regex_literal_prefix(p)
    if pfx:
        cond = ((F.col("term") >= pfx)
                & (F.col("term") < _prefix_hi(pfx)) & cond)
    return _expand_dict_terms(spark, index_dir, cond, cap)


def search_regexp(spark: SparkSession, index_dir, queries: DataFrame,
                  k: int = TOP_K, cap: int = MAX_PREFIX_EXPANSIONS,
                  n_ranges: int | None = None) -> DataFrame:
    """BM25 top-k for regexp term queries: each row of ``queries`` is
    (query_id, rpattern); whole-term regex expansion
    (:func:`expand_regexp_terms`), scored as a BM25 disjunction through
    the standard engine path (rewrite=scoring_boolean)."""
    qrows = queries.select("query_id", "rpattern").collect()
    expanded = [(int(r["query_id"]),
                 " ".join(expand_regexp_terms(spark, index_dir,
                                              r["rpattern"], cap)))
                for r in qrows]
    qdf = local_df(spark, expanded, "query_id long, qtext string")
    return search_topk(spark, index_dir, qdf, k=k, n_ranges=n_ranges)


def search_match_bool_prefix(spark: SparkSession, index_dir,
                             queries: DataFrame, k: int = TOP_K,
                             cap: int = MAX_PREFIX_EXPANSIONS,
                             n_ranges: int | None = None) -> DataFrame:
    """ES ``match_bool_prefix`` — the other search-as-you-type family
    member (Q14's sibling): the analyzed terms become INDEPENDENT bool
    should clauses, the LAST term a prefix (dictionary-expanded — the
    Q12 range scan, df-desc cap, scoring_boolean rewrite). Unlike
    ``match_phrase_prefix`` no adjacency is required: ``quick brown
    f`` matches docs containing ``quick``, ``brown``, or any
    ``f``-prefixed term ANYWHERE, every matched clause scoring
    independently (ES default operator OR). The expanded disjunction
    runs through the standard engine path — WAND pruning intact. A
    prefix with no dictionary expansion leaves the fixed terms alone,
    exactly ES's behavior for an unexpandable trailing token."""
    from ..textops import tokenize
    qrows = queries.select("query_id", "qtext").collect()
    expanded = []
    for r in qrows:
        toks = tokenize(r["qtext"])
        if not toks:
            expanded.append((int(r["query_id"]), ""))
            continue
        exp = expand_prefix_terms(spark, index_dir, toks[-1], cap)
        expanded.append((int(r["query_id"]),
                         " ".join(sorted(set(toks[:-1]) | set(exp)))))
    qdf = local_df(spark, expanded, "query_id long, qtext string")
    return search_topk(spark, index_dir, qdf, k=k, n_ranges=n_ranges)
