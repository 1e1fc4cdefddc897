"""Chunk/range-parallel WAND (the 10^12-scale query path) must be
bit-identical to single-group WAND and the oracle — including over an
index built with tiny chunk rows (forcing multi-chunk head terms)."""

import os

import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.search import search_wand, search_wand_ranges
from aarhus_spark.sources.fixtures import gen_pages, gen_queries, pages_rows


@pytest.fixture(scope="module")
def setup(spark, tmpdir_session):
    pdf = gen_pages(700)
    idx = os.path.join(tmpdir_session, "idx_chunked")
    # max_postings_per_row=150 forces chunked rows for every head term
    build_index(spark, spark.createDataFrame(pdf), idx,
                n_partitions=4, n_buckets=3, salts=3, max_postings_per_row=150)
    return pdf, idx


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_range_parallel_equals_single_group(spark, setup):
    pdf, idx = setup
    queries = gen_queries(pdf).head(20)
    qdf = spark.createDataFrame(queries)
    want = _collect(search_wand(spark, idx, qdf))
    for n_ranges in (1, 3, 8):
        got = _collect(search_wand_ranges(spark, idx, qdf, n_ranges=n_ranges))
        assert got == want, f"n_ranges={n_ranges}"


def test_range_parallel_matches_oracle(spark, setup):
    pdf, idx = setup
    queries = gen_queries(pdf).head(20)
    oidx = oracle.build(pages_rows(pdf))
    want = sorted(oracle.search_all(
        oidx, list(zip(queries.query_id.tolist(), queries.qtext.tolist()))))
    qdf = spark.createDataFrame(queries)
    got = _collect(search_wand_ranges(spark, idx, qdf, n_ranges=5))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert [g[3] for g in got] == [w[3] for w in want]  # bit-identical
