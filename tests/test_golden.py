"""Frozen-contract drift alarm (SURVEY.md §5 / FIXTURES.md §2): the
NumPy oracle's top-10 for the 50-query reference set over the 2000-page
fixture corpus is FROZEN as parquet. Any change to the tokenizer,
extractor, BM25 form, dedup rule, or docid assignment that alters a
single score bit fails here — regenerate the goldens ONLY with a
deliberate contract change (see tests/golden/)."""

import pandas as pd

from aarhus_spark import oracle
from aarhus_spark.sources.fixtures import gen_pages, gen_queries, pages_rows

GOLDEN = "tests/golden/reference_topk_2000.parquet"
GOLDEN_STATS = "tests/golden/reference_stats_2000.parquet"


def test_oracle_matches_frozen_goldens():
    pdf = gen_pages(2000)
    idx = oracle.build(pages_rows(pdf))
    st = pd.read_parquet(GOLDEN_STATS).iloc[0]
    assert idx.n_docs == st["n_docs"]
    assert idx.avgdl == st["avgdl"]          # bit-exact
    assert len(idx.postings) == st["n_terms"]

    qs = gen_queries(pdf)
    res = oracle.search_all(idx, list(zip(qs.query_id.tolist(), qs.qtext.tolist())))
    got = pd.DataFrame(res, columns=["query_id", "rank", "docid", "score"])
    want = pd.read_parquet(GOLDEN)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_exact=True)  # scores must be bit-identical
