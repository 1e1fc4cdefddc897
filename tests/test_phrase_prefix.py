"""ES match_phrase_prefix (round 7): exact phrase whose trailing
token is a dictionary-expanded prefix. Engine ≡ independent
brute-force oracle (raw token-list scan), single-group ≡
chunk-parallel, and the single-token degenerate case ≡ the prefix
disjunction path bit-for-bit."""

import os

import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.search import (search_phrase_prefix,
                                           search_prefix)
from aarhus_spark.sources.fixtures import gen_pages, pages_rows

K = 10

PP_QUERIES = [
    (0, "the dat"),        # fixed [the] + prefix dat -> data, ...
    (1, "of the dat"),     # two fixed terms + prefix
    (2, "the quer"),       # prefix with wide numbered fan-out (query, query2, ...)
    (3, "data zzzznope"),  # prefix with no expansions -> empty
    (4, "the and t"),      # head-heavy: huge candidate sets, tiny prefix
]


@pytest.fixture(scope="module")
def ppidx(spark, tmpdir_session):
    pdf = gen_pages(600)
    out = os.path.join(tmpdir_session, "idx_pp")
    build_index(spark, spark.createDataFrame(pdf), out,
                n_partitions=4, n_buckets=3, salts=3,
                max_postings_per_row=150)
    return pdf, out, oracle.build(pages_rows(pdf))


def _rows(df):
    return sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                  for r in df.collect())


def test_phrase_prefix_engine_vs_oracle(spark, ppidx):
    _, out, oidx = ppidx
    qdf = spark.createDataFrame(PP_QUERIES, "query_id long, qtext string")
    got = _rows(search_phrase_prefix(spark, out, qdf, k=K))
    exp = []
    for qid, qtext in PP_QUERIES:
        exp.extend((qid, r, d, s) for r, d, s in
                   oracle.search_phrase_prefix(oidx, qtext, k=K))
    assert got == sorted(exp)
    qids = {q for q, *_ in got}
    assert 0 in qids and 1 in qids, "phrase-prefix queries must match docs"
    assert 3 not in qids, "unexpandable prefix must return nothing"


def test_phrase_prefix_single_vs_ranges(spark, ppidx):
    _, out, _ = ppidx
    qdf = spark.createDataFrame(PP_QUERIES, "query_id long, qtext string")
    single = _rows(search_phrase_prefix(spark, out, qdf, k=K, n_ranges=1))
    ranged = _rows(search_phrase_prefix(spark, out, qdf, k=K, n_ranges=3))
    assert single == ranged


def test_single_token_degenerates_to_prefix_disjunction(spark, ppidx):
    """A phrase of ONE prefix token has no positional constraint left:
    result must be bit-identical to the Q12 prefix path at the same
    expansion cap."""
    _, out, _ = ppidx
    pp = spark.createDataFrame([(0, "quer")], "query_id long, qtext string")
    pq = spark.createDataFrame([(0, "quer")], "query_id long, prefix string")
    a = _rows(search_phrase_prefix(spark, out, pp, k=K, max_expansions=50))
    b = _rows(search_prefix(spark, out, pq, k=K, cap=50))
    assert a == b
    assert len(a) > 0


def test_expansion_cap_is_load_bearing(spark, ppidx):
    """Shrinking max_expansions must shrink (or keep) the candidate
    match set — the deterministic df-desc cap is part of the
    contract, not decoration."""
    _, out, oidx = ppidx
    qdf = spark.createDataFrame([(0, "the dat")], "query_id long, qtext string")
    wide = {d for _q, _r, d, _s in
            _rows(search_phrase_prefix(spark, out, qdf, k=100,
                                       max_expansions=50))}
    narrow = {d for _q, _r, d, _s in
              _rows(search_phrase_prefix(spark, out, qdf, k=100,
                                         max_expansions=1))}
    assert narrow <= wide
    exp1 = oracle.search_phrase_prefix(oidx, "the dat", k=100,
                                       max_expansions=1)
    assert narrow == {d for _r, d, _s in exp1}


def test_match_bool_prefix_vs_python_twin(spark, ppidx):
    """Q44 match_bool_prefix: disjunctive BM25 over fixed terms ∪
    trailing-prefix expansions — NO adjacency. Twin = oracle.search
    over the expanded disjunction; the match set must be a superset of
    the same qtext's phrase-prefix matches, strictly for at least one
    query (adjacency is load-bearing for the sibling)."""
    from aarhus_spark.operators.search import (search_match_bool_prefix,
                                               search_phrase_prefix)
    from aarhus_spark.textops import tokenize
    _, out, oidx = ppidx
    qdf = spark.createDataFrame(PP_QUERIES, "query_id long, qtext string")
    got = _rows(search_match_bool_prefix(spark, out, qdf, k=10**6))
    exp = []
    for qid, qtext in PP_QUERIES:
        toks = tokenize(qtext)
        exp_terms = sorted(
            {t for t in oidx.df if t.startswith(toks[-1])},
            key=lambda t: (-oidx.df[t], t))[:1024]
        terms = sorted(set(toks[:-1]) | set(exp_terms))
        exp.extend((qid, r, d, s) for r, d, s in
                   oracle.search(oidx, " ".join(terms), k=oidx.n_docs))
    assert got == sorted(exp)
    mbp = {(q, d) for q, _, d, _ in got}
    pp = {(q, d) for q, _, d, _ in
          _rows(search_phrase_prefix(spark, out, qdf, k=10**6))}
    assert pp <= mbp
    assert pp < mbp, "adjacency never bit — sibling contrast vacuous"
