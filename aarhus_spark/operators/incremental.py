"""Incremental (delta) index build — SURVEY §2.11 X6 / §2.4 J4.

ES-parity continuous ingest: new crawl batches are indexed into a
DELTA index containing only urls absent from the base index (left
anti join on the base doclens — the resume/delta idiom), with docids
offset past the base docid space so the two indexes are disjoint.
Search runs over [base, delta, ...] via the multi-dir support in
operators/search.py, which

- sums per-term df across dirs (exact global idf),
- combines N/avgdl from the stats files,
- recomputes exact per-posting partials with the combined avgdl, and
- rescales stored WAND block bounds by max(1, avgdl_comb/avgdl_dir)
  — safe because tf/(tf + k1(1-b) + k1·b·dl/A) is increasing in A:
  den(A_comb) ≥ den(A_dir)·A_dir/A_comb, so
  partial(A_comb) ≤ partial(A_dir)·A_comb/A_dir.

A delta'd corpus therefore returns EXACTLY the results of a monolithic
rebuild over base∪delta pages (asserted in tests/test_incremental.py),
modulo one deliberate difference: docids. A monolithic rebuild assigns
dense ranks over ALL urls; the delta assigns base docids + offset
ranks over new urls. Scores are docid-independent, so rank-identity is
checked via urls.

PRECONDITION — append-only ingest: the base∪delta ≡ monolithic
equivalence above holds only when no url in the new batch re-crawls a
url already in a base index with a NEWER warc_ts and different content;
such a row would win the frozen latest-warc_ts dedup in a monolithic
rebuild, but the url-level anti join would drop it from the delta and
keep serving the stale base version. ``new_pages_only`` therefore
DETECTS re-crawls (doclens stores each url's winning warc_ts) and, by
default, raises — routing them to a rebuild/compaction of the affected
base is the caller's decision, not something to paper over silently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexPaths, build_index
from .search import load_stats


def new_pages_only(spark: SparkSession, pages: DataFrame, base_dirs: list[str],
                   on_recrawl: str = "error") -> DataFrame:
    """J4: pages whose url is not in any base index (left anti join).

    Re-crawl guard (see module docstring): a page whose url exists in a
    base index WITH a strictly newer warc_ts violates the append-only
    precondition. ``on_recrawl``:

    - ``"error"`` (default): raise with the offending count — the caller
      must compact/rebuild the affected base index;
    - ``"ignore"``: documented stale-serving — drop them like any
      already-indexed url (the base keeps winning even though a
      monolithic rebuild would prefer the newer crawl).
    """
    if on_recrawl not in ("error", "ignore"):
        raise ValueError(f"on_recrawl must be 'error' or 'ignore', got {on_recrawl!r}")
    out = pages
    for d in base_dirs:
        done = spark.read.parquet(IndexPaths(d).doclens)
        if on_recrawl == "error" and "warc_ts" in done.columns:
            n_conflicts = (
                pages.join(done.select("url", F.col("warc_ts").alias("base_ts")), "url")
                .filter(F.col("warc_ts") > F.col("base_ts"))
                .count())
            if n_conflicts:
                raise ValueError(
                    f"{n_conflicts} page row(s) re-crawl urls already in base index "
                    f"{d} with a newer warc_ts. A url-level delta cannot represent "
                    f"them (the stale base version would keep being served); "
                    f"compact/rebuild that base index, or pass on_recrawl='ignore' "
                    f"to accept serving the base version.")
        out = out.join(done.select("url"), "url", "left_anti")
    return out


def build_delta(
    spark: SparkSession,
    pages: DataFrame,
    base_dirs: list[str] | str,
    delta_dir: str,
    on_recrawl: str = "error",
    **build_kwargs,
) -> dict:
    """Build a delta index of the not-yet-indexed pages. Returns stats
    (N may be 0 → no index is written and {} is returned). Raises on
    re-crawled urls unless on_recrawl='ignore' (module docstring)."""
    base_dirs = [base_dirs] if isinstance(base_dirs, str) else list(base_dirs)
    offset = sum(int(load_stats(d)["N"]) for d in base_dirs)
    fresh = new_pages_only(spark, pages, base_dirs, on_recrawl=on_recrawl)
    return build_index(spark, fresh, delta_dir, docid_offset=offset, **build_kwargs)


def index_chain(base_dirs: list[str] | str, delta_dir: str | None = None) -> list[str]:
    dirs = [base_dirs] if isinstance(base_dirs, str) else list(base_dirs)
    if delta_dir and os.path.exists(IndexPaths(delta_dir).stats):
        dirs.append(delta_dir)
    return dirs
