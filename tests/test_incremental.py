"""Incremental (delta) index build: base + delta search must return
EXACTLY the results of a monolithic rebuild over the union corpus
(scores bit-identical; docids compared via urls since the two
assignment schemes differ by design — operators/incremental.py)."""

import os

import pytest

from aarhus_spark.operators.build import IndexPaths, build_index
from aarhus_spark.operators.incremental import build_delta, new_pages_only
from aarhus_spark.operators.search import search_taat, search_wand
from aarhus_spark.sources.fixtures import gen_pages, gen_queries


@pytest.fixture(scope="module")
def corpora(spark):
    # delta indexing is append-only (new urls); a RE-crawled url needs a
    # base rebuild/merge (documented in operators/incremental.py), so the
    # equivalence corpus must be duplicate-free
    pdf = gen_pages(900)
    pdf = pdf[~pdf["url"].duplicated(keep=False)].reset_index(drop=True)
    batch1 = pdf.iloc[:600]
    return pdf, batch1


def _url_results(spark, idx_dirs, queries, fn):
    """[(query_id, rank, url, score)] — url-keyed for cross-index compare."""
    qdf = spark.createDataFrame(queries)
    res = fn(spark, idx_dirs, qdf).collect()
    url_of = {}
    dirs = idx_dirs if isinstance(idx_dirs, list) else [idx_dirs]
    for d in dirs:
        for r in spark.read.parquet(IndexPaths(d).doclens).collect():
            url_of[r["docid"]] = r["url"]
    return sorted((r["query_id"], r["rank"], url_of[r["docid"]], r["score"])
                  for r in res)


def test_delta_equals_monolithic(spark, corpora, tmpdir_session):
    pdf, batch1 = corpora
    queries = gen_queries(pdf).head(15)

    base = os.path.join(tmpdir_session, "inc_base")
    delta = os.path.join(tmpdir_session, "inc_delta")
    mono = os.path.join(tmpdir_session, "inc_mono")

    build_index(spark, spark.createDataFrame(batch1), base,
                n_partitions=4, n_buckets=3, salts=2)
    stats_d = build_delta(spark, spark.createDataFrame(pdf), base, delta,
                          n_partitions=4, n_buckets=3, salts=2)
    assert stats_d["N"] > 0
    assert stats_d["build_config"]["docid_offset"] > 0
    build_index(spark, spark.createDataFrame(pdf), mono,
                n_partitions=4, n_buckets=3, salts=2)

    # disjoint docid spaces + full coverage
    n_base = spark.read.parquet(IndexPaths(base).doclens).count()
    n_mono = spark.read.parquet(IndexPaths(mono).doclens).count()
    assert n_base + stats_d["N"] == n_mono

    for fn in (search_taat, search_wand):
        got = _url_results(spark, [base, delta], queries, fn)
        want = _url_results(spark, mono, queries, fn)
        assert got == want, f"{fn.__name__} mismatch"


def test_anti_join_filters_known_urls(spark, corpora, tmpdir_session):
    pdf, batch1 = corpora
    base = os.path.join(tmpdir_session, "inc_base")  # built above
    fresh = new_pages_only(spark, spark.createDataFrame(pdf), [base])
    base_urls = {r["url"] for r in
                 spark.read.parquet(IndexPaths(base).doclens).collect()}
    fresh_urls = {r["url"] for r in fresh.select("url").distinct().collect()}
    assert not (fresh_urls & base_urls)
