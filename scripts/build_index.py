"""spark-submit entry point: distributed inverted-index build.

    spark-submit --master ... --py-files engine.zip \
        scripts/build_index.py --source /path/pages_parquet \
        --out /path/index [--resume] [--buckets N] [--salts S]

``--source`` accepts a parquet path (sandbox) or ``iceberg:cat.db.pages``
(production; configure the Iceberg catalog on the session). Package
``engine.zip`` with scripts/make_engine_zip.sh.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable both via `spark-submit --py-files engine.zip` and directly
# from a checkout (python scripts/build_index.py ...)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--salts", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from aarhus_spark.config import SALTS
    from aarhus_spark.operators.build import build_index
    from aarhus_spark.session import get_spark
    from aarhus_spark.sources.io import read_pages

    spark = get_spark("aarhus-build", master=args.master)
    pages = read_pages(spark, args.source)
    stats = build_index(
        spark, pages, args.out,
        n_partitions=args.partitions, n_buckets=args.buckets,
        salts=args.salts or SALTS, resume=args.resume,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
