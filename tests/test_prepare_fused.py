"""The fused prepare+docid path (one shuffle) must produce exactly the
rows of the standalone prepare_pages operator (two shuffles), and
docids must equal the url rank."""

from aarhus_spark.operators.build import prepare_and_assign_docids, prepare_pages
from aarhus_spark.sources.fixtures import gen_pages


def test_fused_equals_standalone(spark):
    pdf = gen_pages(500)
    pages = spark.createDataFrame(pdf)
    want = sorted((r["url"], r["text"]) for r in prepare_pages(pages).collect())
    fused_df, n, sumdl = prepare_and_assign_docids(spark, pages, 4)
    fused = fused_df.collect()
    got = sorted((r["url"], r["text"]) for r in fused)
    assert got == want
    assert n == len(want)
    # inline dl matches the frozen tokenizer
    from aarhus_spark.textops import tokenize
    for r in fused[:50]:
        assert r["dl"] == len(tokenize(r["text"]))
    # docid == rank of url in sorted order
    by_docid = sorted((r["docid"], r["url"]) for r in fused)
    assert [d for d, _ in by_docid] == list(range(len(by_docid)))
    urls = [u for _, u in by_docid]
    assert urls == sorted(urls)
