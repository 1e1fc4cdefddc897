"""Capture .explain('formatted') for the touched query paths.

Usage: python bench/capture_plans.py <out_dir> [index_dir]

Works against BOTH the round-7 and round-8 trees (same public API), so
the judge's before/after plan files come from the same script:

    python bench/capture_plans.py plans/r08   # after (current tree)
    PYTHONPATH=/tmp/r7tree python bench/capture_plans.py /tmp/before

The index must already exist (bench.py leaves /tmp/aarhus_bench_idx_0.1).
Explain only — no job runs beyond the analysis/dictionary lookups the
query builders themselves perform.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.environ.get("PYTHONPATH",
                                  os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    out_dir = sys.argv[1]
    idx_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/aarhus_bench_idx_0.1"
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from aarhus_spark.session import get_spark
    spark = get_spark("capture-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd
    from aarhus_spark.sources.fixtures import gen_queries
    from aarhus_spark.sources.io import pages_from_documents
    qdf = spark.createDataFrame(gen_queries(pd.DataFrame()))
    ph = spark.createDataFrame(
        [(0, "hash join"), (1, "sort data")], "query_id long, qtext string")
    pages = pages_from_documents(spark, "/root/testdata/sf0.1")

    from aarhus_spark.operators.search import (search_phrase, search_taat,
                                               search_wand,
                                               search_wand_ranges)
    from aarhus_spark.operators.eslayer import (search_facets,
                                                search_metric_aggs,
                                                search_rescore,
                                                search_significant_terms)

    plans = {
        "search_taat": lambda: search_taat(spark, idx_dir, qdf),
        "search_wand": lambda: search_wand(spark, idx_dir, qdf),
        "search_wand_ranges": lambda: search_wand_ranges(
            spark, idx_dir, qdf, n_ranges=8),
        "search_phrase": lambda: search_phrase(spark, idx_dir, ph),
        "search_facets": lambda: search_facets(spark, idx_dir, qdf,
                                               n_buckets=8),
        "search_metric_aggs": lambda: search_metric_aggs(spark, idx_dir, qdf),
        "search_rescore": lambda: search_rescore(spark, idx_dir, ph,
                                                 window_size=50, k=10),
        "search_sigterms": lambda: search_significant_terms(
            spark, idx_dir, qdf, pages, n_terms=10),
    }
    # r8 session-2 additions: the span and highlight paths gained
    # LocalRelation query frames (search.local_df) — capture them too
    from aarhus_spark.operators.eslayer import search_highlight
    from aarhus_spark.operators.spans import search_span_near
    plans["search_span"] = lambda: search_span_near(
        spark, idx_dir, ph, slop=3, in_order=True)
    plans["search_highlight"] = lambda: search_highlight(
        spark, idx_dir, qdf, pages, k=10, window=4)
    for name, fn in plans.items():
        try:
            txt = grab(fn())
        except Exception as e:  # pragma: no cover
            txt = f"ERROR {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)

    # multi_match: the exhaustive combiner's single-DAG plan, and (r8
    # only) the pruned path's candidate-restricted TAAT stage plan
    try:
        from aarhus_spark.operators.multifield import search_multi_match
        mf_idx = idx_dir + "_mfplans"
        if not os.path.exists(os.path.join(mf_idx, "multifield.json")):
            from pyspark.sql import functions as F
            from aarhus_spark.operators.multifield import build_field_indexes
            build_field_indexes(spark, pages, mf_idx, fields={
                "text": F.col("text"),
                "title": F.substring(F.col("text"), 1, 40)})
        try:
            mm = search_multi_match(spark, mf_idx, qdf, k=10, prune=False)
            r8_tree = True
        except TypeError:            # round-7 signature has no `prune`
            mm = search_multi_match(spark, mf_idx, qdf, k=10)
            r8_tree = False
        with open(os.path.join(out_dir, "multi_match_exhaustive.txt"), "w") as f:
            f.write(grab(mm))
        print("wrote multi_match_exhaustive")
        if r8_tree:
            import numpy as np
            cand = np.arange(0, 50, dtype=np.int64)
            restricted = search_taat(
                spark, os.path.join(mf_idx, "field=text"), qdf,
                return_matches=True, _candidate_docids=cand)
            with open(os.path.join(
                    out_dir, "multi_match_pruned_rescore_stage.txt"), "w") as f:
                f.write(grab(restricted))
            print("wrote multi_match_pruned_rescore_stage")
        else:
            print("skipping pruned-stage plan (round-7 tree)")
    except Exception as e:  # pragma: no cover
        print("multi_match plans failed:", e)
    spark.stop()


if __name__ == "__main__":
    main()
