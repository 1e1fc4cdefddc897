"""As-of join (SURVEY §2.4 J5) — Spark has no native ASOF JOIN; the
scalable idiom is union-tag-sort-window: tag both sides, union them,
and carry the most recent right-side row forward with a running
``last(ignorenulls=True)`` window over (key, time). One shuffle on the
key, NO pair explosion — unlike the naive theta-join (left × right
filtered on time), this stays O(|L|+|R|) rows through the exchange,
which is what survives when both sides are web-scale event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (strict: <) for the same key.

    Returns left columns + ``right_vals`` (null when no match).
    Deterministic: among right rows tied on right_ts, the greatest
    value tuple wins (orderBy right_ts, then vals).
    """
    lcols = left.columns
    l = (left.withColumn("__t", F.col(left_ts).cast("timestamp"))
         .withColumn("__is_l", F.lit(1)))
    r = (right.select(F.col(key), F.col(right_ts).alias("__t"),
                      *[F.col(c) for c in right_vals])
         .withColumn("__t", F.col("__t").cast("timestamp"))
         .filter(F.col("__t").isNotNull())
         .withColumn("__is_l", F.lit(0)))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in right_vals:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.select(*lcols, "__t", "__is_l", *right_vals).unionByName(
        r.select(*lcols, "__t", "__is_l", *right_vals))

    # order: time asc; at equal time, right rows first unless strict
    # (strict: left rows first so a same-instant right row is NOT seen)
    side_order = F.asc("__is_l") if not strict else F.desc("__is_l")
    w = (Window.partitionBy(key)
         .orderBy(F.asc("__t"), side_order, *[F.asc_nulls_first(c) for c in right_vals])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(F.when(F.col("__is_l") == 0, F.col(c)), ignorenulls=True)
               .over(w).alias(c) for c in right_vals]
    return (u.select(*lcols, "__t", "__is_l", *carried)
            .filter(F.col("__is_l") == 1)
            .select(*lcols, *right_vals))
