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
    since the previous call (or construction).

    Incremental scan (r8): ``spill_totals`` pays one py4j round trip
    PER STAGE IN THE APP'S HISTORY (~0.4 ms each — 70 ms at 180
    stages, measured), and build/compact call ``delta()`` at every
    stage boundary, so in a long session the metrics read itself grew
    into the timed region (seconds per build late in a bench run).
    ``stageList`` returns stages stageId-DESCENDING, so the tracker
    scans only stages newer than the last FINALIZED one and keeps a
    running sum. A stage is finalized (its value added to the running
    sum, never re-read) only once it is no longer active — completed
    stages' metrics are final. Caveat, documented: a cluster-mode
    stage re-run after a fetch failure (same stageId, new attempt)
    that spills MORE in the re-run is under-counted by the already-
    finalized first attempt; local mode never re-runs stages, and the
    metrics sink trades that corner for O(new stages) boundary cost."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._final_max = -1          # highest finalized stageId
        self._final_mem = 0
        self._final_disk = 0
        self._last_mem, self._last_disk = self._totals()

    def _totals(self) -> tuple[int, int]:
        try:
            sc = self._spark.sparkContext
            jvm = sc._jvm
            store = sc._jsc.sc().statusStore()
            empty = jvm.java.util.ArrayList()
            darr = sc._gateway.new_array(jvm.double, 0)
            seq = store.stageList(empty, False, False, darr, empty)
            active = set(sc.statusTracker().getActiveStageIds())
            recent = []               # (stageId, mem, disk), id desc
            for i in range(seq.size()):
                sd = seq.apply(i)
                sid = sd.stageId()
                if sid <= self._final_max:
                    break             # older stages already summed
                recent.append((sid, int(sd.memoryBytesSpilled()),
                               int(sd.diskBytesSpilled())))
            mem = self._final_mem + sum(r[1] for r in recent)
            disk = self._final_disk + sum(r[2] for r in recent)
            # finalize the contiguous inactive run just above _final_max
            for sid, m, d in sorted(recent):
                if sid in active:
                    break
                self._final_max = sid
                self._final_mem += m
                self._final_disk += d
            return mem, disk
        except Exception:
            return self._last_mem, self._last_disk

    def delta(self) -> dict:
        mem, disk = self._totals()
        d = {"mem_spill_bytes": mem - self._last_mem,
             "disk_spill_bytes": disk - self._last_disk}
        self._last_mem, self._last_disk = mem, disk
        return d
