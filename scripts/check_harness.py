"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
values. Usage: python scripts/check_harness.py [sf_dir] [name ...]"""

from __future__ import annotations

import decimal
import math
import sys

sys.path.insert(0, ".")


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    import duckdb
    from aarhus_spark.session import get_spark
    from aarhus_spark.harness import TABLES
    import __spark_entry__ as entry  # the REAL driver surface

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check-harness", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                print(f"{name:28s} ROWS-ONLY  rows={len(srows)}")
                continue
            rel = con.sql(sql)
            dcols = rel.columns
            drows = rel.fetchall()
            problems = []
            if scols != dcols:
                problems.append(f"cols {scols} != {dcols}")
            if len(srows) != len(drows):
                problems.append(f"rowcount {len(srows)} != {len(drows)}")
            if not problems:
                a = normalize(srows, scols)
                b = normalize(drows, dcols)
                if a != b:
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    problems.append(f"values differ, e.g. {diff}")
            if problems:
                n_fail += 1
                print(f"{name:28s} FAIL  {'; '.join(problems)}")
            else:
                n_pass += 1
                print(f"{name:28s} OK    rows={len(srows)}")
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e).splitlines()[0][:140]}")
    print(f"\n{n_pass} ok, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
