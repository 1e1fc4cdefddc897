"""ES-layer ops at a large corpus: generate N synthetic pages
(deterministic, seed 42 — same generator as the scaling protocol),
build the index once at local[CPUS], then time the round-7 ES
aggregation layer over the 50-query reference set against that index
— facets, date_histogram, significant_terms, function_score,
suggester, and (round 7d) the histogram/range/filters/composite bucket
aggs, collapse, explain, and ordered span_near. Complements
bench/scaling.py's query-path audit (TAAT/WAND) with the agg layer's
at-scale behavior: every op here is bounded by the match set (the
bound ES itself pays), so wall should track the WAND/TAAT numbers plus
one shuffle-join + hash agg; span_near adds the two-pass positional
decode (position bytes only for candidate blocks).

Usage: python bench/es_at_scale.py [n_pages] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from aarhus_spark.operators.build import build_index
    from aarhus_spark.operators.eslayer import (search_collapse,
                                                search_composite,
                                                search_date_histogram,
                                                search_explain,
                                                search_facets,
                                                search_filters_agg,
                                                search_function_score,
                                                search_histogram,
                                                search_significant_terms,
                                                suggest_terms)
    from aarhus_spark.operators.spans import search_span_near
    from aarhus_spark.operators.search import search_wand
    from aarhus_spark.session import get_spark
    from aarhus_spark.sources.fixtures import gen_pages, gen_pages_spark, gen_queries

    workdir = tempfile.mkdtemp(prefix="aarhus_es_scale_")
    src = os.path.join(workdir, "pages")
    idx = os.path.join(workdir, "idx")
    spark = get_spark("es-at-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    gen_pages_spark(spark, n_pages, partitions=2 * cpus) \
        .write.mode("overwrite").parquet(src)
    pages = spark.read.parquet(src)

    t0 = time.time()
    stats = build_index(spark, pages, idx,
                        n_partitions=4 * cpus, n_buckets=4 * cpus)
    build_s = time.time() - t0

    qpd = gen_queries(gen_pages(2000))
    qdf = spark.createDataFrame(qpd)
    # span_near needs >= 2 clauses: the 30 multi-token reference queries
    sqdf = spark.createDataFrame(qpd[qpd["qtext"].str.contains(" ")])
    wdf = spark.createDataFrame(
        [(0, "tha"), (1, "dta"), (2, "jion"), (3, "srt")],
        "word_id long, word string")

    def best2(fn):
        best = None
        for _ in range(2):
            t = time.time()
            fn()
            w = time.time() - t
            best = w if best is None or w < best else best
        return round(best, 3)

    out = {
        "n_pages": n_pages, "n_docs": int(stats["N"]), "cpus": cpus,
        "build_s": round(build_s, 1),
        "wand_50q": best2(lambda: search_wand(spark, idx, qdf).count()),
        "facets_50q": best2(lambda: search_facets(
            spark, idx, qdf, n_buckets=8).count()),
        "date_hist_50q": best2(lambda: search_date_histogram(
            spark, idx, qdf, interval="minute").count()),
        "sigterms_50q": best2(lambda: search_significant_terms(
            spark, idx, qdf, pages, n_terms=10).count()),
        "fscore_50q": best2(lambda: search_function_score(
            spark, idx, qdf, k=10, scale_days=0.002).count()),
        "suggest_4w": best2(lambda: suggest_terms(spark, idx, wdf).count()),
        "hist_50q": best2(lambda: search_histogram(
            spark, idx, qdf, interval=25).count()),
        "filters_50q": best2(lambda: search_filters_agg(
            spark, idx, qdf,
            {"short": "dl < 40", "long": "dl >= 40"}).count()),
        "composite_p1_50q": best2(lambda: search_composite(
            spark, idx, qdf, page_size=50).count()),
        "collapse_50q": best2(lambda: search_collapse(
            spark, idx, qdf, k=10, inner_k=2).count()),
        "explain_50q": best2(lambda: search_explain(
            spark, idx, qdf, pages, k=10).count()),
        "span_near_30q": best2(lambda: search_span_near(
            spark, idx, sqdf, slop=3, in_order=True).count()),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
