"""ES layer over a base+tombstone-delta chain (round-8 advice fix):
_doc_meta must exclude dead docids, global_metric_aggs must aggregate
live docs only, and search_explain's per-term contributions must sum
back to the chain retrieval score (tombstone-corrected N_eff/df_eff)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aarhus_spark.operators.build import IndexPaths, build_index
from aarhus_spark.operators.incremental import build_delta
from aarhus_spark.sources.fixtures import gen_pages


@pytest.fixture(scope="module")
def es_chain(spark, tmpdir_session):
    pdf = gen_pages(200)
    base_dir = os.path.join(tmpdir_session, "esc_base")
    delta_dir = os.path.join(tmpdir_session, "esc_delta")
    mono_dir = os.path.join(tmpdir_session, "esc_mono")
    build_index(spark, spark.createDataFrame(pdf), base_dir,
                n_partitions=4, n_buckets=3, salts=3)
    doclens = spark.read.parquet(IndexPaths(base_dir).doclens).toPandas()
    recrawl_urls = set(sorted(doclens["url"])[::5])
    rec = pdf[pdf["url"].isin(recrawl_urls)].copy()
    rec = rec.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    rec["text"] = rec["text"].fillna("") + " recrawled revision"
    rec["html"] = None
    rec["warc_ts"] = rec["warc_ts"] + pd.Timedelta(days=2)
    build_delta(spark, spark.createDataFrame(rec), base_dir, delta_dir,
                on_recrawl="tombstone", n_partitions=4, n_buckets=3, salts=3)
    live_v1 = pdf[~pdf["url"].isin(recrawl_urls)]
    mono_pdf = pd.concat([live_v1, rec], ignore_index=True)
    build_index(spark, spark.createDataFrame(mono_pdf), mono_dir,
                n_partitions=4, n_buckets=3, salts=3)
    return base_dir, delta_dir, mono_dir


def test_doc_meta_excludes_tombstoned(spark, es_chain):
    from aarhus_spark.operators.eslayer import _doc_meta
    from aarhus_spark.operators.search import load_tombstones
    base_dir, delta_dir, mono_dir = es_chain
    dead, _ = load_tombstones(spark, [base_dir, delta_dir])
    assert dead.size > 0
    meta = _doc_meta(spark, [base_dir, delta_dir]).toPandas()
    assert not set(meta["docid"]) & set(int(d) for d in dead)
    mono = _doc_meta(spark, mono_dir).toPandas()
    # same LIVE logical rows as the monolithic rebuild (url, dl match)
    a = meta[["url", "dl"]].sort_values(["url"]).reset_index(drop=True)
    b = mono[["url", "dl"]].sort_values(["url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_global_metric_aggs_chain_equals_monolithic(spark, es_chain):
    from aarhus_spark.operators.eslayer import global_metric_aggs
    base_dir, delta_dir, mono_dir = es_chain
    qdf = spark.createDataFrame([(0, "data"), (1, "spark")],
                                "query_id long, qtext string")
    a = (global_metric_aggs(spark, [base_dir, delta_dir], qdf)
         .orderBy("query_id").toPandas())
    b = global_metric_aggs(spark, mono_dir, qdf).orderBy("query_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_explain_contribs_sum_to_chain_score(spark, es_chain):
    from aarhus_spark.operators.eslayer import search_explain
    from aarhus_spark.operators.search import search_topk
    from aarhus_spark.sources.fixtures import gen_pages

    base_dir, delta_dir, mono_dir = es_chain
    pdf = gen_pages(200)
    rec_urls = None  # docs table: latest text per url, as the chain serves
    # reconstruct the LIVE corpus text the chain serves (v1 text for
    # non-recrawled urls + revised text for recrawled ones)
    doclens = spark.read.parquet(IndexPaths(base_dir).doclens).toPandas()
    recrawl_urls = set(sorted(doclens["url"])[::5])
    rec = pdf[pdf["url"].isin(recrawl_urls)].copy()
    rec = rec.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    rec["text"] = rec["text"].fillna("") + " recrawled revision"
    live_v1 = pdf[~pdf["url"].isin(recrawl_urls)]
    docs_pdf = pd.concat([live_v1, rec], ignore_index=True)[["url", "text"]]
    docs = spark.createDataFrame(docs_pdf.assign(
        text=docs_pdf["text"].fillna("")))

    qdf = spark.createDataFrame([(0, "data table"), (1, "spark")],
                                "query_id long, qtext string")
    dirs = [base_dir, delta_dir]
    ex = search_explain(spark, dirs, qdf, docs, k=5,
                        round_to=12, rank_round_to=None).toPandas()
    assert len(ex) > 0
    # per-(query, doc): Σ contrib == the retrieval score (chain path)
    sums = (ex.groupby(["query_id", "docid"])["contrib_r"].sum()
            .reset_index())
    top = search_topk(spark, dirs, qdf, k=5).toPandas()
    merged = sums.merge(top, on=["query_id", "docid"])
    assert len(merged) == len(top)
    assert (merged["contrib_r"] - merged["score"]).abs().max() < 1e-6


def test_sigterms_chain_fg_equals_monolithic(spark, es_chain):
    from aarhus_spark.operators.eslayer import search_significant_terms
    base_dir, delta_dir, mono_dir = es_chain
    pdf = gen_pages(200)
    doclens = spark.read.parquet(IndexPaths(base_dir).doclens).toPandas()
    recrawl_urls = set(sorted(doclens["url"])[::5])
    rec = pdf[pdf["url"].isin(recrawl_urls)].copy()
    rec = rec.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    rec["text"] = rec["text"].fillna("") + " recrawled revision"
    live_v1 = pdf[~pdf["url"].isin(recrawl_urls)]
    docs_pdf = pd.concat([live_v1, rec], ignore_index=True)[["url", "text"]]
    docs = spark.createDataFrame(docs_pdf.assign(
        text=docs_pdf["text"].fillna("")))
    qdf = spark.createDataFrame([(0, "data")], "query_id long, qtext string")
    # n_terms large enough to return EVERY fg bucket on both sides —
    # the ranked top-n would differ by design (chain bg_df is the
    # stored Lucene-parity df incl. dead postings; mono's is purged)
    a = search_significant_terms(spark, [base_dir, delta_dir], qdf, docs,
                                 n_terms=1_000_000).toPandas()
    b = search_significant_terms(spark, mono_dir, qdf, docs,
                                 n_terms=1_000_000).toPandas()
    # foreground stats come from LIVE matched docs only — identical to
    # the monolithic rebuild, term set and counts alike
    am = a.set_index("term")["fg_df"].to_dict()
    bm = b.set_index("term")["fg_df"].to_dict()
    assert am == bm and len(am) > 0
