"""BM25 hand-computed values + oracle behavior (SURVEY.md §5)."""

import math

import numpy as np

from aarhus_spark import oracle
from aarhus_spark.config import B, K1
from aarhus_spark.scoring import idf, partial
from aarhus_spark.sources.fixtures import gen_pages, gen_queries, pages_rows


def test_idf_hand_value():
    # N=10, df=3 -> ln(1 + 7.5/3.5)
    assert math.isclose(idf(3, 10), math.log(1 + 7.5 / 3.5), rel_tol=0, abs_tol=1e-15)


def test_partial_hand_value():
    # tf=2, dl=100, avgdl=80
    expect = 2.0 / (2.0 + K1 * (1 - B + B * 100.0 / 80.0))
    got = partial(np.array([2.0]), np.array([100.0]), 80.0)[0]
    assert math.isclose(got, expect, abs_tol=1e-15)


def _mini_rows():
    import datetime as dt
    ts = dt.datetime(2026, 1, 1)
    mk = lambda u, text, lang="en", t=ts, html=None: dict(
        url=u, warc_ts=t, html=html, text=text, lang=lang)
    return [
        mk("http://a/1", "the quick brown fox"),
        mk("http://a/2", "the the the slow fox"),
        mk("http://b/1", "quick quick spark index"),
        mk("http://b/2", "unrelated words entirely"),
        mk("http://c/1", "german text", lang="de"),          # filtered
        mk("http://a/1", "the quick brown fox NEW",          # dup, later ts wins
           t=ts + dt.timedelta(days=1)),
        mk("http://d/1", None, html=b"<p>html only fox</p>"),  # E(html) path
        mk("http://e/1", ""),                                 # empty -> dropped
    ]


def test_oracle_build_semantics():
    idx = oracle.build(_mini_rows())
    # docids: sorted urls among surviving docs
    assert idx.urls == ["http://a/1", "http://a/2", "http://b/1", "http://b/2", "http://d/1"]
    assert idx.n_docs == 5
    # dedup latest wins: doc 0 is the NEW version (5 tokens)
    assert idx.dls[0] == 5
    # html extraction path
    assert idx.dls[4] == 3
    # df: "fox" in docs 0,1,4
    np.testing.assert_array_equal(idx.postings["fox"][0], [0, 1, 4])
    assert idx.df["quick"] == 2
    assert idx.postings["quick"][1].tolist() == [1, 2]  # tfs


def test_oracle_search_ranking():
    idx = oracle.build(_mini_rows())
    res = oracle.search(idx, "quick fox")
    # doc 2 has quick tf=2 (high) but no fox... compute expectation loosely:
    assert [r[0] for r in res] == list(range(1, len(res) + 1))
    scores = [r[2] for r in res]
    assert scores == sorted(scores, reverse=True)
    docids = {r[1] for r in res}
    assert docids <= {0, 1, 2, 4}
    # no-hit query
    assert oracle.search(idx, "zzznothing") == []
    # absent+present == present-only scores
    a = oracle.search(idx, "fox zzzabsent")
    b = oracle.search(idx, "fox")
    assert [(d, s) for _, d, s in a] == [(d, s) for _, d, s in b]


def test_oracle_tiebreak_docid_asc():
    import datetime as dt
    ts = dt.datetime(2026, 1, 1)
    rows = [dict(url=f"http://t/{i}", warc_ts=ts, html=None, text="same tiny doc", lang="en")
            for i in range(15)]
    idx = oracle.build(rows)
    res = oracle.search(idx, "tiny", k=10)
    assert [d for _, d, _ in res] == list(range(10))  # docid asc among ties


def test_oracle_on_fixture_smoke():
    pdf = gen_pages(400)
    idx = oracle.build(pages_rows(pdf))
    assert idx.n_docs > 300
    qs = gen_queries(pdf)
    res = oracle.search_all(idx, list(zip(qs.query_id.tolist(), qs.qtext.tolist())))
    assert len(res) > 300  # most queries return a full top-10
