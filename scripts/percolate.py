"""Percolate (reverse search) via spark-submit: match an incoming
parquet batch of documents (url, text) against a registered-queries
parquet (query_id, qtext, kind, msm) — kind in must|msm|phrase
(eslayer.percolate contract). Writes or prints (url, query_id, kind)
matches.

    spark-submit --py-files engine.zip scripts/percolate.py \
        --docs /data/incoming.parquet --registered /data/queries.parquet \
        [--out /data/matches] [--master local[8]]

The registered set is broadcast; documents never shuffle — the ingest
shape that holds at 10^12 docs/day (module docstring in
operators/eslayer.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet of incoming documents (url, text)")
    ap.add_argument("--registered", required=True,
                    help="parquet of registered queries "
                         "(query_id, qtext, kind, msm)")
    ap.add_argument("--out", default=None,
                    help="output parquet dir (default: print to stdout)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from aarhus_spark.operators.eslayer import percolate
    from aarhus_spark.session import get_spark

    spark = get_spark("aarhus-percolate", master=args.master)
    docs = spark.read.parquet(args.docs)
    reg = spark.read.parquet(args.registered)
    missing = {"query_id", "qtext", "kind", "msm"} - set(reg.columns)
    if missing:
        ap.error(f"registered queries parquet lacks columns: {sorted(missing)}")
    res = percolate(spark, reg, docs)
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for r in res.orderBy("url", "query_id").collect():
            print(f"{r['url']}\t{r['query_id']}\t{r['kind']}")


if __name__ == "__main__":
    main()
