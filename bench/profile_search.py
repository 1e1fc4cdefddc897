"""Phase-level profiling of one search op at sf0.1 (guide §1: measure
first). Not part of the driver contract — bench.py is frozen."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

from aarhus_spark.session import get_spark


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark("profile-search", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from aarhus_spark.sources.fixtures import gen_queries
    import pandas as pd
    idx_dir = "/tmp/aarhus_bench_idx_0.1"
    qpdf = gen_queries(pd.DataFrame())
    qdf = spark.createDataFrame(qpdf)

    from aarhus_spark.operators.search import (
        _chain_stats, analyze_queries, _collect_terms, candidate_segments,
        _global_df_map, search_taat)

    # warmup (JVM + python workers)
    search_taat(spark, idx_dir, qdf).count()

    t = {}
    t0 = time.time(); n_docs, avgdl, _, dead = _chain_stats(spark, idx_dir); t["chain_stats"] = time.time() - t0
    t0 = time.time(); qterms = analyze_queries(qdf); terms = _collect_terms(qterms); t["collect_terms"] = time.time() - t0
    t0 = time.time(); seg = candidate_segments(spark, idx_dir, terms); t["cand_seg_plan"] = time.time() - t0
    t0 = time.time(); dfg = _global_df_map(spark, idx_dir, terms, seg=seg, dead=dead); t["global_df"] = time.time() - t0
    t0 = time.time(); search_taat(spark, idx_dir, qdf).count(); t["full_taat"] = time.time() - t0
    t0 = time.time(); search_taat(spark, idx_dir, qdf).count(); t["full_taat2"] = time.time() - t0

    # time a trivial job for per-job overhead reference
    t0 = time.time(); spark.range(1000).groupBy((F("id") % 8).alias("g")).count().collect() if False else None
    import pyspark.sql.functions as SF
    t0 = time.time(); spark.range(1000).select(SF.sum("id")).collect(); t["trivial_job"] = time.time() - t0
    t0 = time.time(); spark.range(100000).repartition(32, "id").groupBy(SF.col("id") % 8).count().collect(); t["shuffle_job"] = time.time() - t0

    for k, v in t.items():
        print(f"{k:18s} {v*1000:8.0f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
