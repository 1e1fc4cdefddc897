"""ES-layer ops at a large corpus: generate N synthetic pages
(deterministic, seed 42 — same generator as the scaling protocol),
build the index once at local[CPUS], then time the round-7 ES
aggregation layer over the 50-query reference set against that index
— facets, date_histogram, significant_terms, function_score,
suggester. Complements bench/scaling.py's query-path audit (TAAT/WAND)
with the agg layer's at-scale behavior: every op here is bounded by
the match set (the bound ES itself pays), so wall should track the
WAND/TAAT numbers plus one shuffle-join + hash agg.

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
    from aarhus_spark.operators.eslayer import (search_date_histogram,
                                                search_facets,
                                                search_function_score,
                                                search_significant_terms,
                                                suggest_terms)
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

    qdf = spark.createDataFrame(gen_queries(gen_pages(2000)))
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
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
