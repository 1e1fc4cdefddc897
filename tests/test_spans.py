"""Span queries (Q37-Q39) vs brute-force pure-Python oracles over the
NumPy oracle index: span_near ordered/unordered window budgets,
span_not pre/post guard bands, span_first position bound — and the
ordered ⊆ unordered / not ⊆ phrase containments that make each
constraint load-bearing."""

import os
from itertools import product
from math import log

import pytest

from aarhus_spark import oracle
from aarhus_spark.operators.build import build_index
from aarhus_spark.operators.spans import (search_span_first,
                                          search_span_near,
                                          search_span_not)
from aarhus_spark.sources.fixtures import gen_pages, pages_rows
from aarhus_spark.textops import tokenize


@pytest.fixture(scope="module")
def sidx(spark, tmpdir_session):
    pdf = gen_pages(400)
    out = os.path.join(tmpdir_session, "idx_spans")
    build_index(spark, spark.createDataFrame(pdf), out,
                n_partitions=4, n_buckets=3, salts=2,
                max_postings_per_row=150)
    return out, oracle.build(pages_rows(pdf))


def _positions(oidx, d, t):
    return [i for i, x in enumerate(oidx.tokens[d]) if x == t]


def _near_docs(oidx, clauses, slop, in_order):
    """Brute force: try every choice of one position per clause."""
    width = slop + len(clauses) - 1
    out = set()
    for d in range(oidx.n_docs):
        lists = [_positions(oidx, d, t) for t in clauses]
        if any(not l for l in lists):
            continue
        for pick in product(*lists):
            if len(set(pick)) != len(pick):
                continue  # a token occupies one position
            if in_order and any(pick[i] >= pick[i + 1]
                                for i in range(len(pick) - 1)):
                continue
            if max(pick) - min(pick) <= width:
                out.add(d)
                break
    return out


def _not_docs(oidx, phrase, exclude, pre, post):
    L = len(phrase)
    out = set()
    for d in range(oidx.n_docs):
        toks = oidx.tokens[d]
        ex = set(_positions(oidx, d, exclude))
        for a in range(len(toks) - L + 1):
            if toks[a:a + L] != phrase:
                continue
            if not any(p in ex
                       for p in range(a - pre, a + L + post)):
                out.add(d)
                break
    return out


def _ranked(oidx, terms, docs, k=10):
    """Disjunctive BM25 over the distinct terms, restricted to docs."""
    from aarhus_spark.config import B, K1
    scores = {}
    for d in docs:
        s = 0.0
        for t in sorted(set(terms)):
            tf = oidx.tokens[d].count(t)
            if not tf:
                continue
            df = oidx.df[t]
            idf = log(1.0 + (oidx.n_docs - df + 0.5) / (df + 0.5))
            s += idf * tf / (tf + K1 * (1.0 - B
                                        + B * int(oidx.dls[d]) / oidx.avgdl))
        scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(top)]


QNEAR = [(0, "data the"), (1, "query2 join11"), (2, "the the")]
SLOP = 3


def _check(got_rows, exp):
    got = sorted((r["query_id"], r["rank"], r["docid"], r["score"])
                 for r in got_rows)
    exp = sorted(exp)
    assert [g[:3] for g in got] == [e[:3] for e in exp]
    for g, e in zip(got, exp):
        assert g[3] == pytest.approx(e[3], rel=1e-12)


@pytest.mark.parametrize("in_order", [True, False])
def test_span_near_vs_brute_force(spark, sidx, in_order):
    out, oidx = sidx
    qdf = spark.createDataFrame(QNEAR, "query_id long, qtext string")
    res = search_span_near(spark, out, qdf, slop=SLOP,
                           in_order=in_order).collect()
    exp = []
    nonempty = 0
    for qid, qtext in QNEAR:
        clauses = tokenize(qtext)
        docs = _near_docs(oidx, clauses, SLOP, in_order)
        nonempty += bool(docs)
        exp.extend((qid, r, d, s)
                   for r, d, s in _ranked(oidx, clauses, docs))
    assert nonempty >= 2
    _check(res, exp)


def test_ordered_strictly_subset_of_unordered(spark, sidx):
    out, oidx = sidx
    qdf = spark.createDataFrame(QNEAR, "query_id long, qtext string")
    o = {(r["query_id"], r["docid"]) for r in search_span_near(
        spark, out, qdf, slop=SLOP, in_order=True, k=10**6).collect()}
    u = {(r["query_id"], r["docid"]) for r in search_span_near(
        spark, out, qdf, slop=SLOP, in_order=False, k=10**6).collect()}
    assert o <= u
    assert o < u, "ordering constraint never bit — pick harder queries"


def test_span_near_single_vs_ranges(spark, sidx):
    out, _ = sidx
    qdf = spark.createDataFrame(QNEAR, "query_id long, qtext string")
    a = sorted(map(tuple, search_span_near(
        spark, out, qdf, slop=SLOP, in_order=True, n_ranges=1).collect()))
    b = sorted(map(tuple, search_span_near(
        spark, out, qdf, slop=SLOP, in_order=True, n_ranges=5).collect()))
    assert a == b


QNOT = [(0, "the data", "of"), (1, "data the", "query2")]


def test_span_not_vs_brute_force(spark, sidx):
    out, oidx = sidx
    qdf = spark.createDataFrame(
        QNOT, "query_id long, qtext string, exclude string")
    res = search_span_not(spark, out, qdf, pre=2, post=2).collect()
    exp = []
    excl_bit = 0
    for qid, qtext, exclude in QNOT:
        phrase = tokenize(qtext)
        docs = _not_docs(oidx, phrase, exclude, 2, 2)
        plain = _not_docs(oidx, phrase, "___never___", 0, 0)
        excl_bit += bool(plain - docs)
        exp.extend((qid, r, d, s)
                   for r, d, s in _ranked(oidx, phrase, docs))
    assert excl_bit, "exclusion never bit — pick overlapping terms"
    _check(res, exp)


def test_span_first_vs_brute_force(spark, sidx):
    out, oidx = sidx
    end = 4
    qf = [(0, "data"), (1, "the")]
    qdf = spark.createDataFrame(qf, "query_id long, qtext string")
    res = search_span_first(spark, out, qdf, end=end).collect()
    exp = []
    for qid, term in qf:
        docs = {d for d in range(oidx.n_docs)
                if any(p < end for p in _positions(oidx, d, term))}
        alld = {d for d in range(oidx.n_docs) if _positions(oidx, d, term)}
        assert docs < alld, "position bound never bit"
        exp.extend((qid, r, d, s) for r, d, s in _ranked(oidx, [term], docs))
    _check(res, exp)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:          # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    import numpy as np

    from aarhus_spark.operators.spans import _ordered_chain_locals

    ALPHABET = ["a", "b", "c", "d"]

    docs_strategy = st.lists(                      # corpus of token docs
        st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=12),
        min_size=1, max_size=6)
    clause_strategy = st.lists(st.sampled_from(ALPHABET),
                               min_size=2, max_size=4)

    def _brute_ordered(doc, clauses, width):
        """Brute force: every strictly-increasing choice of one
        position per clause, window end-start <= width."""
        lists = [[i for i, t in enumerate(doc) if t == c]
                 for c in clauses]
        if any(not l for l in lists):
            return False
        for pick in product(*lists):
            if all(pick[i] < pick[i + 1] for i in range(len(pick) - 1)) \
                    and pick[-1] - pick[0] <= width:
                return True
        return False

    @settings(max_examples=300, deadline=None)
    @given(docs=docs_strategy, clauses=clause_strategy,
           slop=st.integers(min_value=0, max_value=6))
    def test_ordered_chain_kernel_vs_brute_force(docs, clauses, slop):
        """The vectorized greedy chain must agree with the brute-force
        product on random token streams — incl. repeated clause terms,
        docs missing a clause, and zero-slop adjacency."""
        width = slop + len(clauses) - 1
        keys = []
        for c in clauses:
            ks = []
            for local, doc in enumerate(docs):
                ks.extend((local << 32) | p
                          for p, t in enumerate(doc) if t == c)
            keys.append(np.array(sorted(ks), dtype=np.int64))
        got = set(_ordered_chain_locals(keys, width).tolist())
        exp = {local for local, doc in enumerate(docs)
               if _brute_ordered(doc, clauses, width)}
        assert got == exp


QIV = [(0, "the|of data"), (1, "query2|join11 the"), (2, "data the|of")]
IV_GAPS = 2


def _iv_docs(oidx, clauses, max_gaps, ordered):
    width = max_gaps + len(clauses) - 1
    out = set()
    for d in range(oidx.n_docs):
        lists = [sorted(p for t in alts for p in _positions(oidx, d, t))
                 for alts in clauses]
        if any(not l for l in lists):
            continue
        for pick in product(*lists):
            if ordered and any(pick[i] >= pick[i + 1]
                               for i in range(len(pick) - 1)):
                continue
            if max(pick) - min(pick) <= width:
                out.add(d)
                break
    return out


@pytest.mark.parametrize("ordered", [True, False])
def test_intervals_vs_brute_force(spark, sidx, ordered):
    from aarhus_spark.operators.spans import (_parse_intervals,
                                              search_intervals)
    out, oidx = sidx
    qdf = spark.createDataFrame(QIV, "query_id long, qtext string")
    res = search_intervals(spark, out, qdf, max_gaps=IV_GAPS,
                           ordered=ordered).collect()
    exp = []
    for qid, qtext in QIV:
        clauses = _parse_intervals(qtext)
        docs = _iv_docs(oidx, clauses, IV_GAPS, ordered)
        present = sorted({t for alts in clauses for t in alts
                          if t in oidx.df})
        exp.extend((qid, r, d, s)
                   for r, d, s in _ranked(oidx, present, docs))
    _check(res, exp)
    assert len(res) > 0


def test_intervals_any_of_is_load_bearing(spark, sidx):
    """A doc matched ONLY via the second alternative must appear —
    the any_of union, not just the first term, drives candidacy."""
    from aarhus_spark.operators.spans import (_parse_intervals,
                                              search_intervals)
    out, oidx = sidx
    qdf = spark.createDataFrame(QIV, "query_id long, qtext string")
    full = {(r["query_id"], r["docid"]) for r in search_intervals(
        spark, out, qdf, max_gaps=IV_GAPS, k=10**6).collect()}
    hit_alt = 0
    for qid, qtext in QIV:
        clauses = _parse_intervals(qtext)
        first_only = [[alts[0]] for alts in clauses]
        d_full = _iv_docs(oidx, clauses, IV_GAPS, True)
        d_first = _iv_docs(oidx, first_only, IV_GAPS, True)
        extra = d_full - d_first
        hit_alt += len(extra)
        assert {(qid, d) for d in extra} <= full
    assert hit_alt, "no doc ever needed the 2nd alternative"


def test_intervals_rejects_overlapping_alternatives(spark, sidx):
    from aarhus_spark.operators.spans import _parse_intervals
    with pytest.raises(ValueError, match="disjoint"):
        _parse_intervals("the|data data")
