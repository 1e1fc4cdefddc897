"""ES bool-query completion (round 6): must_not (neg_qtext) and
minimum_should_match on every query path, checked three ways — TAAT ≡
single-group WAND ≡ chunk-parallel WAND bit-identical, and all equal to
an independent pure-Python/NumPy oracle (aarhus_spark.oracle)."""

import os

import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.search import (search_taat, search_topk,
                                           search_wand, search_wand_ranges)
from aarhus_spark.sources.fixtures import gen_pages, pages_rows

K = 10
QSCHEMA = "query_id long, qtext string, neg_qtext string"

# (query_id, positive text, must_not text) — terms from the fixture
# vocabulary head so every clause has postings (asserted non-trivial
# below); query 2's must_not is out-of-vocabulary (no-op exclusion)
BOOL_QUERIES = [
    (0, "spark0 data query2", "the"),
    (1, "merge12 sort13", "of and"),
    (2, "index1 web4 crawl5", "zzzznotaterm"),
    (3, "data join11", None),
]


@pytest.fixture(scope="module")
def bidx(spark, tmpdir_session):
    pdf = gen_pages(600)
    out = os.path.join(tmpdir_session, "idx_bool")
    build_index(spark, spark.createDataFrame(pdf), out,
                n_partitions=4, n_buckets=3, salts=3,
                max_postings_per_row=150)
    return pdf, out, oracle.build(pages_rows(pdf))


def _rows(df):
    return sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                  for r in df.collect())


def _oracle_rows(oidx, queries, **kw):
    out = []
    for qid, qtext, neg in queries:
        out.extend((qid, r, d, s) for r, d, s in
                   oracle.search(oidx, qtext, k=K, neg_qtext=neg, **kw))
    return sorted(out)


def _all_paths(spark, out, qdf, **kw):
    return (_rows(search_taat(spark, out, qdf, k=K, **kw)),
            _rows(search_wand(spark, out, qdf, k=K, **kw)),
            _rows(search_wand_ranges(spark, out, qdf, k=K, n_ranges=3, **kw)))


def test_must_not_three_way_and_oracle(spark, bidx):
    _, out, oidx = bidx
    qdf = spark.createDataFrame(BOOL_QUERIES, QSCHEMA)
    a, b, c = _all_paths(spark, out, qdf)
    expect = _oracle_rows(oidx, BOOL_QUERIES)
    assert a == b == c == expect
    # exclusion is load-bearing: without must_not the results differ
    plain = _oracle_rows(oidx, [(q, t, None) for q, t, _ in BOOL_QUERIES])
    assert a != plain
    # ... but the OOV must_not query (id 2) is identical to its plain form
    assert [r for r in a if r[0] == 2] == [r for r in plain if r[0] == 2]
    # and excluded docs are genuinely absent: every doc containing an
    # excluded term is out of that query's results
    for qid, _, neg in BOOL_QUERIES:
        if not neg:
            continue
        excl = set()
        for t in neg.split():
            if t in oidx.postings:
                excl.update(oidx.postings[t][0].tolist())
        assert not excl & {r[2] for r in a if r[0] == qid}


def test_min_should_match_three_way_and_oracle(spark, bidx):
    _, out, oidx = bidx
    qs = [(0, "spark0 data query2", None), (1, "the merge12 sort13 hash14", None)]
    qdf = spark.createDataFrame(qs, QSCHEMA)
    for m in (2, 3):
        a, b, c = _all_paths(spark, out, qdf, min_should_match=m)
        expect = _oracle_rows(oidx, qs, min_should_match=m)
        assert a == b == c == expect, f"m={m}"
    # m=1 degenerates to the plain disjunction
    a1, _, _ = _all_paths(spark, out, qdf, min_should_match=1)
    assert a1 == _oracle_rows(oidx, qs)
    # msm=2 is load-bearing at the candidate level: the corpus holds
    # docs matching exactly one analyzed term of query 0
    from collections import Counter
    cnt = Counter()
    for t in ("spark0", "data", "query2"):
        cnt.update(oidx.postings[t][0].tolist())
    assert any(c == 1 for c in cnt.values())
    # m beyond the analyzed term count empties (ES: can't match 5 of 3)
    a5, b5, c5 = _all_paths(spark, out,
                            spark.createDataFrame(qs[:1], QSCHEMA),
                            min_should_match=5)
    assert a5 == b5 == c5 == []


def test_msm_with_must_not_combined(spark, bidx):
    _, out, oidx = bidx
    qs = [(0, "spark0 data query2 page3", "hash14"),
          (1, "the merge12 sort13", "web4")]
    qdf = spark.createDataFrame(qs, QSCHEMA)
    a, b, c = _all_paths(spark, out, qdf, min_should_match=2)
    expect = _oracle_rows(oidx, qs, min_should_match=2)
    assert a == b == c == expect
    assert len(a) > 0


def test_must_with_must_not(spark, bidx):
    """require_all (bool.must) composes with must_not on all paths."""
    _, out, oidx = bidx
    qs = [(0, "spark0 data", "hash14")]
    qdf = spark.createDataFrame(qs, QSCHEMA)
    a, b, c = _all_paths(spark, out, qdf, require_all=True)
    expect = _oracle_rows(oidx, qs, require_all=True)
    assert a == b == c == expect
    assert len(a) > 0


def test_pos_term_also_excluded_empties(spark, bidx):
    """must 'spark' + must_not 'spark' can match nothing (ES)."""
    _, out, _ = bidx
    qdf = spark.createDataFrame([(0, "spark0", "spark0 data")], QSCHEMA)
    a, b, c = _all_paths(spark, out, qdf)
    assert a == b == c == []


def test_neg_only_query_is_empty(spark, bidx):
    """A query whose positive side analyzes to nothing returns nothing
    (top-k relevance needs at least one scoring clause)."""
    _, out, _ = bidx
    qdf = spark.createDataFrame([(0, "zzzznotaterm", "spark0")], QSCHEMA)
    a, b, c = _all_paths(spark, out, qdf)
    assert a == b == c == []


def test_require_all_and_msm_are_exclusive(spark, bidx):
    _, out, _ = bidx
    qdf = spark.createDataFrame([(0, "spark0 data", None)], QSCHEMA)
    for fn in (search_taat, search_wand, search_wand_ranges):
        with pytest.raises(ValueError):
            fn(spark, out, qdf, require_all=True, min_should_match=2)
    with pytest.raises(ValueError):
        search_taat(spark, out, qdf, min_should_match=0)


def test_search_topk_routes_bool_args(spark, bidx):
    """The default dispatcher forwards msm + neg on both its branches."""
    _, out, oidx = bidx
    qs = [(0, "spark0 data query2", "hash14")]
    qdf = spark.createDataFrame(qs, QSCHEMA)
    one = _rows(search_topk(spark, out, qdf, k=K, n_ranges=1,
                            min_should_match=2))
    many = _rows(search_topk(spark, out, qdf, k=K, n_ranges=3,
                             min_should_match=2))
    expect = _oracle_rows(oidx, qs, min_should_match=2)
    assert one == many == expect


# ---------------------------------------------------------------------------
# round 6b: mixed bool — must_qtext + optional should clauses
# ---------------------------------------------------------------------------

QSCHEMA_M = "query_id long, qtext string, neg_qtext string, must_qtext string"


def _oracle_rows_m(oidx, queries, **kw):
    out = []
    for qid, qtext, neg, must in queries:
        out.extend((qid, r, d, s) for r, d, s in
                   oracle.search(oidx, qtext, k=K, neg_qtext=neg,
                                 must_qtext=must, **kw))
    return sorted(out)


def test_mixed_must_should_three_way_and_oracle(spark, bidx):
    _, out, oidx = bidx
    qs = [(0, "data query2", None, "spark0"),          # must + should
          (1, None, None, "merge12 sort13"),           # must-only, null qtext
          (2, "data", "web4", "index1"),               # must + should + neg
          (3, "data query2", None, "zzzznotaterm")]    # OOV must -> empty
    qdf = spark.createDataFrame(qs, QSCHEMA_M)
    a, b, c = _all_paths(spark, out, qdf)
    expect = _oracle_rows_m(oidx, qs)
    assert a == b == c == expect
    assert [r for r in a if r[0] == 3] == []            # OOV must empties
    assert len([r for r in a if r[0] == 1]) > 0         # must-only returns
    # must is load-bearing: every q0 result contains spark0, and the
    # corpus has docs that match the should terms but not the must term
    have = set(oidx.postings["spark0"][0].tolist())
    assert all(r[2] in have for r in a if r[0] == 0)
    some = set(oidx.postings["data"][0].tolist())
    assert some - have, "need should-matching docs lacking the must term"


def test_mixed_must_should_with_msm(spark, bidx):
    """min_should_match gates the SHOULD clauses only when a must
    clause is present (ES default msm=0 with must)."""
    _, out, oidx = bidx
    qs = [(0, "data query2 page3", None, "spark0")]
    qdf = spark.createDataFrame(qs, QSCHEMA_M)
    base, _, _ = _all_paths(spark, out, qdf)
    for m in (1, 2, 3):
        a, b, c = _all_paths(spark, out, qdf, min_should_match=m)
        expect = _oracle_rows_m(oidx, qs, min_should_match=m)
        assert a == b == c == expect, f"m={m}"
    assert base == _oracle_rows_m(oidx, qs)


def test_must_term_also_in_should_counts_once(spark, bidx):
    """A term in both clauses scores once, as must — identical to
    putting it in must alone."""
    _, out, oidx = bidx
    both = [(0, "spark0 data", None, "spark0")]
    only = [(0, "data", None, "spark0")]
    a1, b1, c1 = _all_paths(spark, out, spark.createDataFrame(both, QSCHEMA_M))
    a2, _, _ = _all_paths(spark, out, spark.createDataFrame(only, QSCHEMA_M))
    assert a1 == b1 == c1 == a2 == _oracle_rows_m(oidx, both)


def test_must_conflicts_and_arg_validation(spark, bidx):
    _, out, _ = bidx
    # must + must_not on the same term: nothing can satisfy both
    qdf = spark.createDataFrame([(0, "data", "spark0", "spark0")], QSCHEMA_M)
    a, b, c = _all_paths(spark, out, qdf)
    assert a == b == c == []
    # require_all with a must_qtext column is ambiguous -> error
    qdf2 = spark.createDataFrame([(0, "data", None, "spark0")], QSCHEMA_M)
    for fn in (search_taat, search_wand, search_wand_ranges):
        with pytest.raises(ValueError, match="must_qtext"):
            fn(spark, out, qdf2, require_all=True)
