"""Executor-metric capture for the S6 lineage sink (SURVEY §4.2).

``spill_totals`` reads the app-wide cumulative memory/disk spill bytes
from Spark's AppStatusStore (the same store the UI serves, available
with the UI disabled). ``build_index``/``compact_indexes`` snapshot it
at every stage boundary and write the per-stage DELTA into
metrics.jsonl — the "spill bytes per stage" figure the S6 metrics sink
promises, and the direct evidence for A6 (sort/agg spill handling is
engine-automatic; when it happens, it is now *recorded*, and
tests/test_spill.py forces it to happen).

Driver-side py4j, one call per stage boundary — never on a hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def spill_totals(spark: SparkSession) -> tuple[int, int]:
    """App-cumulative (memoryBytesSpilled, diskBytesSpilled) across all
    completed stages. Returns (0, 0) if the status store is unreadable
    (never fails a build over a metrics read)."""
    try:
        sc = spark.sparkContext
        jvm = sc._jvm
        store = sc._jsc.sc().statusStore()
        empty = jvm.java.util.ArrayList()
        darr = sc._gateway.new_array(jvm.double, 0)
        seq = store.stageList(empty, False, False, darr, empty)
        mem = disk = 0
        for i in range(seq.size()):
            sd = seq.apply(i)
            mem += sd.memoryBytesSpilled()
            disk += sd.diskBytesSpilled()
        return int(mem), int(disk)
    except Exception:
        return 0, 0


class SpillTracker:
    """Per-stage spill deltas: ``delta()`` returns the spill accrued
    since the previous call (or construction)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._mem, self._disk = spill_totals(spark)

    def delta(self) -> dict:
        mem, disk = spill_totals(self._spark)
        d = {"mem_spill_bytes": mem - self._mem,
             "disk_spill_bytes": disk - self._disk}
        self._mem, self._disk = mem, disk
        return d
