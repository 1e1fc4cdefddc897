"""spark-submit entry point: compact a base+delta index chain into one
index (ES force-merge parity; bit-equal to a monolithic rebuild).

    spark-submit --py-files engine.zip scripts/compact.py \
        --indexes /path/base /path/delta1 ... --out /path/compacted
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--indexes", nargs="+", required=True,
                    help="index dirs to merge (base first)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--salts", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from aarhus_spark.config import SALTS
    from aarhus_spark.operators.compact import compact_indexes
    from aarhus_spark.session import get_spark

    spark = get_spark("aarhus-compact", master=args.master)
    stats = compact_indexes(spark, args.indexes, args.out,
                            n_buckets=args.buckets,
                            salts=args.salts or SALTS)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
