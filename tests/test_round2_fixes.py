"""Round-2 regression tests: the ADVICE.md findings.

1. ''-vs-NULL dedup tiebreak: engine (desc_nulls_last) and oracle must
   agree that text='' beats text=NULL at a warc_ts tie.
2. search_wand_ranges over a delta index queried ALONE (docids all
   ≥ offset) must not silently return empty — ranges derive from the
   actual docid domain.
3. new_pages_only raises on a re-crawled url with newer warc_ts
   (append-only precondition), and on_recrawl='ignore' keeps serving
   the base version.
4. resume=True with a different build config refuses to run.
5. sign-LSH bucket bits use anchor RANK, not aid % 32 (no aliasing).
6. search_topk dispatcher routes by default_n_ranges.
"""

import datetime
import os

import pandas as pd
import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index, prepare_and_assign_docids
from aarhus_spark.operators.incremental import build_delta, new_pages_only
from aarhus_spark.operators.search import (default_n_ranges, search_taat,
                                           search_topk, search_wand,
                                           search_wand_ranges)
from aarhus_spark.sources.fixtures import gen_pages

TS = datetime.datetime(2026, 1, 1)
TS2 = datetime.datetime(2026, 2, 2)


def _pages_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    return spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, lang string")


def test_empty_vs_null_tiebreak(spark):
    """At a warc_ts tie between text='' and text=NULL(+html), both the
    engine and the NumPy oracle keep '' (doc then dropped as empty) —
    the url must NOT appear in either result, under any row order."""
    html = "<html><body>recovered words</body></html>".encode()
    rows = [
        ("https://x.test/tie", TS, None, "", "en"),
        ("https://x.test/tie", TS, html, None, "en"),
        ("https://x.test/keep", TS, None, "kept words here", "en"),
    ]
    for order in (rows, rows[::-1]):
        # oracle
        oidx = oracle.build([
            {"url": u, "warc_ts": t, "html": h, "text": x, "lang": l}
            for u, t, h, x, l in order])
        assert oidx.urls == ["https://x.test/keep"]
        # engine (fused path)
        docs, n, _sumdl = prepare_and_assign_docids(spark, _pages_df(spark, order), 2)
        got = sorted(r["url"] for r in docs.collect())
        assert got == ["https://x.test/keep"]
        assert n == 1


@pytest.fixture(scope="module")
def base_delta(spark, tmpdir_session):
    pdf = gen_pages(400)
    pdf = pdf[~pdf["url"].duplicated(keep=False)].reset_index(drop=True)
    base_pages = spark.createDataFrame(pdf.iloc[:250])
    all_pages = spark.createDataFrame(pdf)
    base = os.path.join(tmpdir_session, "r2_base")
    delta = os.path.join(tmpdir_session, "r2_delta")
    build_index(spark, base_pages, base)
    build_delta(spark, all_pages, base, delta)
    return base, delta


def test_ranges_on_delta_alone(spark, base_delta):
    """Delta index alone: every docid ≥ offset > 0. Ranges from the
    docid domain must reach them; [0, N) ranges would return empty."""
    _, delta = base_delta
    qdf = spark.createDataFrame([(0, "the data and"), (1, "merge window")],
                                "query_id long, qtext string")
    want = sorted(map(tuple, search_taat(spark, delta, qdf).collect()))
    got = sorted(map(tuple, search_wand_ranges(spark, delta, qdf, n_ranges=4).collect()))
    assert len(want) > 0, "fixture queries must hit the delta corpus"
    assert got == want


def test_recrawl_detection(spark, base_delta, tmpdir_session):
    _, _ = base_delta
    base, _ = base_delta
    import pyspark.sql.functions as F
    from aarhus_spark.operators.build import IndexPaths
    one = spark.read.parquet(IndexPaths(base).doclens).select("url").limit(1).collect()
    url = one[0]["url"]
    recrawl = _pages_df(spark, [(url, TS2, None, "fresh recrawled content", "en")])
    with pytest.raises(ValueError, match="re-crawl"):
        new_pages_only(spark, recrawl, [base])
    # ignore: documented stale-serving — the row is dropped like any
    # already-indexed url
    kept = new_pages_only(spark, recrawl, [base], on_recrawl="ignore")
    assert kept.count() == 0
    # a same-url page with an OLDER ts is not a conflict (base wins under
    # the frozen latest-warc_ts contract either way)
    old = _pages_df(spark, [(url, datetime.datetime(2000, 1, 1), None, "old", "en")])
    assert new_pages_only(spark, old, [base]).count() == 0


def test_resume_config_mismatch_refused(spark, base_delta, tmpdir_session):
    import shutil
    from aarhus_spark.operators.build import IndexPaths
    base, _ = base_delta
    # simulate an INTERRUPTED run: stats/segments missing, fragments +
    # build_config present — continuing under a different config must fail
    broken = os.path.join(tmpdir_session, "r2_interrupted")
    shutil.copytree(base, broken)
    os.remove(IndexPaths(broken).stats)
    with pytest.raises(ValueError, match="build config"):
        build_index(spark, _pages_df(spark, []), broken, resume=True, salts=3)
    # a COMPLETED build resumes as a no-op regardless of requested config
    stats = build_index(spark, _pages_df(spark, []), base, resume=True, salts=3)
    assert stats["N"] > 0


def test_sign_lsh_no_anchor_aliasing(spark, sf_dir):
    """Anchors whose ids collide mod 32 must still occupy distinct bits:
    with K anchors every bucket < 2^K."""
    from aarhus_spark.operators.similarity import sign_lsh_buckets
    from aarhus_spark.sources.io import read_table
    emb = read_table(spark, sf_dir, "embeddings")
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(40).collect()]
    anchors = [ids[1], ids[33]]  # 1 % 32 == 33 % 32 under the old scheme
    buckets = {r["bucket"] for r in
               sign_lsh_buckets(emb, anchors).select("bucket").distinct().collect()}
    assert all(0 <= b < 4 for b in buckets), buckets
    assert len(buckets) > 1  # the two bits actually separate vectors


def test_search_topk_dispatch(spark, base_delta):
    base, delta = base_delta
    qdf = spark.createDataFrame([(0, "the data and")], "query_id long, qtext string")
    # tiny index → auto collapses to the single-group path; forced
    # fan-out → chunk-parallel path; results identical either way
    assert default_n_ranges(100) == 1
    assert default_n_ranges((1 << 22) * 3 + 1) == 4
    assert default_n_ranges(10**12) == 512
    auto = sorted(map(tuple, search_topk(spark, [base, delta], qdf).collect()))
    forced = sorted(map(tuple, search_topk(spark, [base, delta], qdf, n_ranges=3).collect()))
    single = sorted(map(tuple, search_wand(spark, [base, delta], qdf).collect()))
    assert auto == single == forced
    assert len(auto) > 0


def test_encoder_carry_across_tiny_arrow_batches(spark, tmpdir_session):
    """The fragment encoder's run-boundary detection must carry a
    (term, salt) run across Arrow batch boundaries. Force 64-row
    batches so nearly every run straddles one, and require the index to
    answer bit-identically to one built with normal batches."""
    import shutil

    from aarhus_spark.sources.fixtures import gen_queries

    pdf = gen_pages(800)
    pages = spark.createDataFrame(pdf)
    qdf = spark.createDataFrame(gen_queries(pdf).head(10))
    normal = os.path.join(tmpdir_session, "ab_normal")
    tiny = os.path.join(tmpdir_session, "ab_tiny")
    shutil.rmtree(normal, ignore_errors=True)
    shutil.rmtree(tiny, ignore_errors=True)
    build_index(spark, pages, normal, n_partitions=4, n_buckets=3, salts=2)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "64")
        build_index(spark, pages, tiny, n_partitions=4, n_buckets=3, salts=2)
    finally:
        spark.conf.set(key, old)
    want = sorted(map(tuple, search_taat(spark, normal, qdf).collect()))
    got = sorted(map(tuple, search_taat(spark, tiny, qdf).collect()))
    assert len(want) > 0
    assert got == want
