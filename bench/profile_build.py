"""Decompose the fragment stage of the synth-60k build: tokenize vs
shuffle+sort vs encode+write (guide §1.4 noop isolation)."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

from aarhus_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/aarhus_profile_shuffle"
    spark = get_spark("profile-build", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8), extra=extra)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from aarhus_spark.operators.build import (
        build_index, prepare_and_assign_docids, tokenize_salt_bucket)
    from aarhus_spark.sources.fixtures import gen_pages_spark

    synth_dir = "/tmp/aarhus_bench_synth_pages"
    if not os.path.exists(os.path.join(synth_dir, "_SUCCESS")):
        gen_pages_spark(spark, 60_000, partitions=2 * cpus) \
            .write.mode("overwrite").parquet(synth_dir)
    synth = spark.read.parquet(synth_dir)

    # warmup build (also gives head_terms etc.)
    out = "/tmp/profile_build_idx"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time(); stats = build_index(spark, synth, out)
    print("full_build_warm", round(time.time() - t0, 2))

    import json
    with open(os.path.join(out, "heads.json")) as f:
        hm = json.load(f)
    head_terms = hm["terms"]
    n_docs = stats["N"]

    docs, n2, sumdl = prepare_and_assign_docids(spark, synth, 32)
    from pyspark import StorageLevel
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()

    from aarhus_spark.config import SALTS
    salted = tokenize_salt_bucket(docs, head_terms, n_docs, SALTS, 32, 0)

    t = {}
    t0 = time.time(); noop(salted); t["tokenize_noop"] = time.time() - t0
    t0 = time.time(); noop(salted); t["tokenize_noop2"] = time.time() - t0
    shuf = (salted.repartition(32, "bucket")
            .sortWithinPartitions("bucket", F.xxhash64("term"), "term", "docid"))
    t0 = time.time(); noop(shuf); t["tok+shuffle+sort_noop"] = time.time() - t0
    t0 = time.time(); noop(shuf); t["tok+shuffle+sort_noop2"] = time.time() - t0

    # full fragment stage timing comes from metrics.jsonl of the warm build
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            print("stage", m["stage"], round(m["wall_s"], 2))
    for k, v in t.items():
        print(f"{k:24s} {v:7.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
