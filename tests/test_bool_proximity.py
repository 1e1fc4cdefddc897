"""Proximity scoring on the bool/WAND paths (round 7): opt-in
``score_mode="proximity"`` on search_taat / search_wand /
search_wand_ranges / search_topk — BM25 × 1/(1 + min window width over
matched positive terms). Checked three ways: TAAT ≡ single-group WAND
≡ chunk-parallel WAND bit-identical, all equal to the independent
NumPy oracle (whose width is a brute-force cartesian product, not the
engine's two-pointer sweep), plus a pure-unit property test of the
two-pointer against brute force on random inputs."""

import os
import random

import numpy as np
import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.search import (_min_window, _min_window_flat,
                                           search_taat, search_topk,
                                           search_wand, search_wand_ranges)
from aarhus_spark.sources.fixtures import gen_pages, pages_rows

K = 10

PROX_QUERIES = [
    (0, "spark0 data query2"),
    (1, "merge12 sort13"),
    (2, "index1 web4 crawl5"),
    (3, "data"),                      # single term -> width 0, factor 1
    (4, "shuffle14 zzzznotaterm"),    # OOV should term is a no-op
]


@pytest.fixture(scope="module")
def pidx(spark, tmpdir_session):
    pdf = gen_pages(600)
    out = os.path.join(tmpdir_session, "idx_prox")
    build_index(spark, spark.createDataFrame(pdf), out,
                n_partitions=4, n_buckets=3, salts=3,
                max_postings_per_row=150)
    return pdf, out, oracle.build(pages_rows(pdf))


def _rows(df):
    return sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                  for r in df.collect())


def _oracle_rows(oidx, queries, **kw):
    out = []
    for q in queries:
        qid, qtext = q[0], q[1]
        extra = dict(kw)
        if len(q) > 2:
            extra["neg_qtext"] = q[2]
        out.extend((qid, r, d, s) for r, d, s in
                   oracle.search(oidx, qtext, k=K, score_mode="proximity",
                                 **extra))
    return sorted(out)


def _all_paths(spark, out, qdf, **kw):
    kw = dict(kw, score_mode="proximity")
    return (_rows(search_taat(spark, out, qdf, k=K, **kw)),
            _rows(search_wand(spark, out, qdf, k=K, **kw)),
            _rows(search_wand_ranges(spark, out, qdf, k=K, n_ranges=3, **kw)))


def test_disjunctive_proximity_three_way_and_oracle(spark, pidx):
    _, out, oidx = pidx
    qdf = spark.createDataFrame(PROX_QUERIES, "query_id long, qtext string")
    taat, wand, ranges = _all_paths(spark, out, qdf)
    assert taat == wand == ranges
    assert taat == _oracle_rows(oidx, PROX_QUERIES)
    assert len(taat) > 0


def test_proximity_reorders_vs_bm25(spark, pidx):
    """The opt-in must actually change something: at least one query's
    ranking (docid sequence) differs from the default BM25 mode, and
    every adjusted score is <= its BM25 counterpart for the same doc."""
    _, out, oidx = pidx
    qdf = spark.createDataFrame(PROX_QUERIES, "query_id long, qtext string")
    base = _rows(search_wand(spark, out, qdf, k=K))
    prox = _rows(search_wand(spark, out, qdf, k=K, score_mode="proximity"))
    base_scores = {(q, d): s for q, _r, d, s in base}
    assert any((q, d) not in base_scores for q, _r, d, _s in prox) or \
        [(q, d) for q, _r, d, _s in base] != [(q, d) for q, _r, d, _s in prox]
    for q, _r, d, s in prox:
        if (q, d) in base_scores:
            assert s <= base_scores[(q, d)] + 1e-12


def test_single_term_width_zero_bit_identical_to_bm25(spark, pidx):
    """A one-term query has window width 0 everywhere -> factor exactly
    1.0 -> proximity scores bit-identical to plain BM25."""
    _, out, oidx = pidx
    qdf = spark.createDataFrame([(3, "data")], "query_id long, qtext string")
    assert _rows(search_wand(spark, out, qdf, k=K)) == \
        _rows(search_wand(spark, out, qdf, k=K, score_mode="proximity"))


def test_min_should_match_proximity(spark, pidx):
    _, out, oidx = pidx
    qdf = spark.createDataFrame(PROX_QUERIES, "query_id long, qtext string")
    taat, wand, ranges = _all_paths(spark, out, qdf, min_should_match=2)
    assert taat == wand == ranges
    assert taat == _oracle_rows(oidx, PROX_QUERIES, min_should_match=2)


def test_must_not_proximity(spark, pidx):
    _, out, oidx = pidx
    neg_queries = [(0, "spark0 data query2", "the"),
                   (1, "merge12 sort13", "of and"),
                   (2, "index1 web4 crawl5", None)]
    qdf = spark.createDataFrame(neg_queries,
                                "query_id long, qtext string, neg_qtext string")
    taat, wand, ranges = _all_paths(spark, out, qdf)
    assert taat == wand == ranges
    assert taat == _oracle_rows(oidx, neg_queries)


def test_mixed_must_should_proximity(spark, pidx):
    _, out, oidx = pidx
    rows = [(0, "query2 web4", "data"), (1, "sort13", "merge12")]
    qdf = spark.createDataFrame(rows,
                                "query_id long, qtext string, must_qtext string")
    kw = dict(score_mode="proximity")
    taat = _rows(search_taat(spark, out, qdf, k=K, **kw))
    wand = _rows(search_wand(spark, out, qdf, k=K, **kw))
    ranges = _rows(search_wand_ranges(spark, out, qdf, k=K, n_ranges=3, **kw))
    assert taat == wand == ranges
    exp = []
    for qid, should, must in rows:
        exp.extend((qid, r, d, s) for r, d, s in
                   oracle.search(oidx, should, k=K, must_qtext=must,
                                 score_mode="proximity"))
    assert taat == sorted(exp)
    assert len(taat) > 0


def test_topk_auto_dispatch_proximity(spark, pidx):
    _, out, _ = pidx
    qdf = spark.createDataFrame(PROX_QUERIES, "query_id long, qtext string")
    auto = _rows(search_topk(spark, out, qdf, k=K, score_mode="proximity"))
    single = _rows(search_wand(spark, out, qdf, k=K, score_mode="proximity"))
    assert auto == single


def test_invalid_score_mode_raises(spark, pidx):
    _, out, _ = pidx
    qdf = spark.createDataFrame([(0, "data")], "query_id long, qtext string")
    with pytest.raises(ValueError, match="score_mode"):
        search_wand(spark, out, qdf, score_mode="nope")


def test_min_window_two_pointer_vs_brute_force():
    """Pure unit property: the engine's two-pointer sweep equals the
    oracle's brute-force product on random multi-list inputs."""
    rng = random.Random(42)
    for _ in range(300):
        n_lists = rng.randint(1, 4)
        lists = [sorted(rng.sample(range(60), rng.randint(1, 6)))
                 for _ in range(n_lists)]
        got = _min_window([np.array(pl, dtype=np.int64) for pl in lists])
        exp = oracle._brute_min_window(lists)
        assert got == exp, (lists, got, exp)


def test_min_window_flat_label_gaps():
    """Labels need not be dense: _min_window_flat must key on DISTINCT
    labels (term indexes from an arbitrary subset)."""
    pos = np.array([0, 5, 9, 2], dtype=np.int64)
    lab = np.array([7, 31, 7, 31], dtype=np.int64)
    # best window covering {7, 31}: positions (0,2) width 2
    assert _min_window_flat(pos, lab) == 2
    assert _min_window_flat(np.array([4], dtype=np.int64),
                            np.array([9], dtype=np.int64)) == 0
