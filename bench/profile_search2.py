"""Test: AQE coalesce configs + explicit-schema parquet reads +
driver-side query tokenization — measured impact on search_taat."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

from aarhus_spark.session import get_spark


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    extra = {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    }
    spark = get_spark("profile-search2", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8), extra=extra)
    spark.sparkContext.setLogLevel("ERROR")

    from aarhus_spark.sources.fixtures import gen_queries
    import pandas as pd
    idx_dir = "/tmp/aarhus_bench_idx_0.1"
    qpdf = gen_queries(pd.DataFrame())
    qdf = spark.createDataFrame(qpdf)

    from aarhus_spark.operators.search import search_taat

    t = {}
    search_taat(spark, idx_dir, qdf).count()  # warmup
    t0 = time.time(); search_taat(spark, idx_dir, qdf).count(); t["taat_coalesce"] = time.time() - t0
    t0 = time.time(); search_taat(spark, idx_dir, qdf).count(); t["taat_coalesce2"] = time.time() - t0

    # driver-side query tokenization cost
    t0 = time.time(); qp = qdf.toPandas(); t["toPandas_queries"] = time.time() - t0
    from aarhus_spark.textops import tokenize_series
    t0 = time.time()
    toks = tokenize_series(qp["qtext"])
    ex = pd.DataFrame({"query_id": qp["query_id"], "term": toks}).explode("term").dropna(subset=["term"]).drop_duplicates()
    t["tokenize_driver"] = time.time() - t0

    # createDataFrame for the broadcast-join side
    t0 = time.time(); spark.createDataFrame(ex); t["createDF_qterms"] = time.time() - t0

    # explicit-schema parquet read vs inferred
    t0 = time.time(); spark.read.parquet(os.path.join(idx_dir, "segments")); t["read_parquet_infer"] = time.time() - t0
    from aarhus_spark.operators.build import SEGMENT_SCHEMA
    t0 = time.time(); spark.read.schema(SEGMENT_SCHEMA).parquet(os.path.join(idx_dir, "segments")); t["read_parquet_schema"] = time.time() - t0
    t0 = time.time(); spark.read.schema(SEGMENT_SCHEMA).parquet(os.path.join(idx_dir, "segments")); t["read_parquet_schema2"] = time.time() - t0

    for k, v in t.items():
        print(f"{k:22s} {v*1000:8.0f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
