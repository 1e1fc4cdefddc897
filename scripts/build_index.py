"""spark-submit entry point: distributed inverted-index build.

    spark-submit --master ... --py-files engine.zip \
        scripts/build_index.py --source /path/pages_parquet \
        --out /path/index [--resume] [--buckets N] [--salts S] \
        [--delta-of base1,base2] [--on-recrawl error|ignore|tombstone]

``--source`` accepts a parquet path (sandbox) or ``iceberg:cat.db.pages``
(production; configure the Iceberg catalog on the session). Package
``engine.zip`` with scripts/make_engine_zip.sh.

``--delta-of`` builds an incremental DELTA index against the given
base chain (docids offset past it); ``--on-recrawl tombstone`` lets
the delta overwrite re-crawled urls (latest-wins; the superseded base
docids are tombstoned and masked at query time).
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
    ap.add_argument("--delta-of", default=None,
                    help="comma-separated base index chain: build an "
                         "incremental delta instead of a full index")
    ap.add_argument("--on-recrawl", choices=["error", "ignore", "tombstone"],
                    default="error")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from aarhus_spark.config import SALTS
    from aarhus_spark.operators.build import build_index
    from aarhus_spark.session import get_spark
    from aarhus_spark.sources.io import read_pages

    spark = get_spark("aarhus-build", master=args.master)
    pages = read_pages(spark, args.source)
    if args.delta_of:
        from aarhus_spark.operators.incremental import build_delta
        stats = build_delta(
            spark, pages, args.delta_of.split(","), args.out,
            on_recrawl=args.on_recrawl,
            n_partitions=args.partitions, n_buckets=args.buckets,
            salts=args.salts or SALTS, resume=args.resume,
        )
    else:
        stats = build_index(
            spark, pages, args.out,
            n_partitions=args.partitions, n_buckets=args.buckets,
            salts=args.salts or SALTS, resume=args.resume,
        )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
