"""End-to-end rank identity: Spark build + search == NumPy oracle
(SURVEY.md §5 'oracle rank-identity' + 3-way equivalence rows).

The oracle is an independent single-node implementation of the frozen
contract (§1.3); scores must match EXACTLY (bit-level), ranks included,
for all 50 reference queries — this operationalizes BASELINE.json's
"rank-identical to the reference".
"""

import os

import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.search import search_taat, search_wand
from aarhus_spark.sources.fixtures import gen_pages, gen_queries, pages_rows

N_PAGES = 1200


@pytest.fixture(scope="module")
def corpus():
    pdf = gen_pages(N_PAGES)
    return pdf, gen_queries(pdf)


@pytest.fixture(scope="module")
def oracle_index(corpus):
    pdf, _ = corpus
    return oracle.build(pages_rows(pdf))


@pytest.fixture(scope="module")
def spark_index(spark, corpus, tmpdir_session):
    pdf, _ = corpus
    pages = spark.createDataFrame(pdf)
    out = os.path.join(tmpdir_session, "idx_main")
    stats = build_index(spark, pages, out, n_partitions=6, n_buckets=7, salts=4)
    return out, stats


def _oracle_results(oracle_index, queries_pdf):
    qs = list(zip(queries_pdf.query_id.tolist(), queries_pdf.qtext.tolist()))
    return oracle.search_all(oracle_index, qs)


def _spark_results(df):
    return [(r["query_id"], r["rank"], r["docid"], r["score"])
            for r in df.collect()]


def _as_sorted(rows):
    return sorted(rows)


def test_stats_match(spark_index, oracle_index):
    _, stats = spark_index
    assert stats["N"] == oracle_index.n_docs
    assert abs(stats["avgdl"] - oracle_index.avgdl) < 1e-12
    assert stats["n_terms"] == len(oracle_index.postings)


def test_rank_identity_taat(spark, spark_index, oracle_index, corpus):
    _, queries = corpus
    out, _ = spark_index
    qdf = spark.createDataFrame(queries)
    got = _as_sorted(_spark_results(search_taat(spark, out, qdf)))
    want = _as_sorted(_oracle_results(oracle_index, queries))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], f"rank mismatch: {g} vs {w}"
        assert g[3] == w[3], f"score not bit-identical: {g} vs {w}"


def test_rank_identity_wand(spark, spark_index, oracle_index, corpus):
    _, queries = corpus
    out, _ = spark_index
    qdf = spark.createDataFrame(queries)
    got = _as_sorted(_spark_results(search_wand(spark, out, qdf)))
    want = _as_sorted(_oracle_results(oracle_index, queries))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], f"rank mismatch: {g} vs {w}"
        assert g[3] == w[3], f"score not bit-identical: {g} vs {w}"


def test_partition_count_invariance(spark, corpus, oracle_index, tmpdir_session):
    """Frozen semantics are partition-count independent: a build at a
    different partitioning + salting yields identical search results."""
    pdf, queries = corpus
    pages = spark.createDataFrame(pdf)
    out2 = os.path.join(tmpdir_session, "idx_alt")
    build_index(spark, pages, out2, n_partitions=3, n_buckets=2, salts=2)
    qdf = spark.createDataFrame(queries.head(20))
    got = _as_sorted(_spark_results(search_taat(spark, out2, qdf)))
    want = _as_sorted([r for r in _oracle_results(oracle_index, queries.head(20))])
    assert got == want
