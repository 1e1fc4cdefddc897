"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship fulltext query — builds the SPIMI
  inverted index over /root/testdata/sf0.001 documents (mapped to the
  Common-Crawl pages shape) and runs block-max-WAND BM25 top-10.
- ``queries()`` / ``oracle_sql()``: one entry per implemented ★
  operator from SURVEY.md §2 (and the training-data-pipeline ops),
  compared by the driver against DuckDB at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aarhus_spark.harness import q_bm25_topk_engine
    return q_bm25_topk_engine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aarhus_spark.harness import QUERIES
    from aarhus_spark.harness_data import QUERIES2
    return {**QUERIES, **QUERIES2}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins. Keys absent here (postings_codec_check — the
    round-7 fold of the binary-codec sweep + the HLL approx-distinct
    agg) are non-SQL-expressible ops → rows-only check."""
    from aarhus_spark.harness import ORACLES
    from aarhus_spark.harness_data import ORACLES2
    return {**ORACLES, **ORACLES2}
