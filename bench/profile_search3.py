"""Decompose the main search_taat job: scan vs decode vs agg vs window."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

from aarhus_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark("profile-search3", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from aarhus_spark.sources.fixtures import gen_queries
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F
    from typing import Iterator
    idx_dir = "/tmp/aarhus_bench_idx_0.1"
    qpdf = gen_queries(pd.DataFrame())
    qdf = spark.createDataFrame(qpdf)

    from aarhus_spark.operators.search import (
        _chain_stats, analyze_queries, _collect_terms, candidate_segments,
        _global_df_map, search_taat, TOP_K)
    search_taat(spark, idx_dir, qdf).count()  # warmup

    n_docs, avgdl, _, dead = _chain_stats(spark, idx_dir)
    qterms = analyze_queries(qdf)
    terms = _collect_terms(qterms)
    seg = candidate_segments(spark, idx_dir, terms)
    dfg = _global_df_map(spark, idx_dir, terms, seg=seg, dead=dead)

    from aarhus_spark.codec import decode_block
    from aarhus_spark.scoring import idf as _idf

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aarhus_spark.scoring import partial as _partial
        for pdf in batches:
            for term, payload, blks in zip(pdf["term"], pdf["postings"], pdf["blocks"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                parts = [decode_block(buf, int(b["offset"])) for b in blks]
                if not parts:
                    continue
                docids = np.concatenate([p[0] for p in parts])
                w = _idf(float(dfg[term]), n_docs)
                tfs = np.concatenate([p[1] for p in parts])
                contrib = w * _partial(tfs, np.concatenate([p[2] for p in parts]), avgdl)
                yield pd.DataFrame({"term": term, "docid": docids, "contrib": contrib})

    t = {}
    t0 = time.time(); noop(seg); t["seg_scan_noop"] = time.time() - t0
    decoded = seg.select("term", "blocks", "postings").mapInPandas(
        decode, schema="term string, docid long, contrib double")
    t0 = time.time(); noop(decoded); t["decoded_noop"] = time.time() - t0
    joined = decoded.join(F.broadcast(qterms), "term")
    t0 = time.time(); noop(joined); t["joined_noop"] = time.time() - t0
    scored = (joined.groupBy("query_id", "docid")
              .agg(F.sort_array(F.collect_list(F.struct("term", "contrib"))).alias("cs"))
              .withColumn("score", F.aggregate("cs", F.lit(0.0), lambda acc, x: acc + x["contrib"])))
    t0 = time.time(); noop(scored.drop("cs")); t["scored_noop"] = time.time() - t0
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
    topk = (scored.drop("cs").withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K))
    t0 = time.time(); noop(topk); t["topk_noop"] = time.time() - t0
    t0 = time.time(); topk.count(); t["topk_count"] = time.time() - t0

    for k, v in t.items():
        print(f"{k:18s} {v*1000:8.0f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
