"""Structured Streaming twins of the X1-X3 window ops: the SAME
transformation functions run under readStream (availableNow trigger)
and must produce the batch answers."""

import os

import pytest

from aarhus_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmpdir_session):
    """The file streaming source requires a DIRECTORY; stage the events
    parquet file into one."""
    import shutil
    d = os.path.join(tmpdir_session, "events_stream_src")
    os.makedirs(d, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(d, "part-0.parquet"))
    return d


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _as_tz(df):
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # formatted window strings are unchanged
    from pyspark.sql import functions as F
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_tumbling_equals_batch(spark, events_src):
    batch = spark.read.parquet(events_src)
    want = _collect_sorted(W.tumbling_counts(batch))

    stream = _as_tz(spark.readStream.schema(batch.schema).parquet(events_src)) \
        .withWatermark("ts", "1 hour")
    got_tbl = W.run_stream_to_memory(stream, W.tumbling_counts, "t_tumbling")
    assert _collect_sorted(got_tbl) == want


def test_streaming_session_equals_batch(spark, events_src):
    batch = spark.read.parquet(events_src)
    want = _collect_sorted(W.session_counts(batch))
    stream = _as_tz(spark.readStream.schema(batch.schema).parquet(events_src)) \
        .withWatermark("ts", "1 hour")
    got = W.run_stream_to_memory(stream, W.session_counts, "t_session")
    assert _collect_sorted(got) == want


def _stage_files(tmpdir_session, name, frames):
    """Controlled micro-batches: one parquet file per frame, mtimes
    spaced so FileStreamSource (ordered by mod time) processes them in
    list order under maxFilesPerTrigger=1."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = os.path.join(tmpdir_session, name)
    os.makedirs(d, exist_ok=True)
    for i, pdf in enumerate(frames):
        p = os.path.join(d, f"{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p,
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (1_000_000_000 + i * 100,) * 2)
    return d


def test_drop_duplicates_within_watermark_eviction(spark, tmpdir_session):
    """X5 state EVICTION semantics, with controlled batch boundaries.
    Two Spark facts this pins down (measured, not assumed):

    - the watermark lags one batch (wm used in batch N = max event time
      of batch N-1 minus delay) and state eviction runs at batch END,
      AFTER that batch's dedup — so a key is re-admitted only two-plus
      batches after the watermark passed its expiry;
    - dropDuplicatesWithinWatermark does NOT late-filter non-duplicate
      keys (a first-seen key older than the watermark is still emitted)
      — its contract is only "exact dedup within the delay window".

    Sequence: A@t0 | sentinel S@far (wm→far-1h next batch; A's state
    evicted at the end of the batch after that) | B@t0 late spacer
    (emitted — not a duplicate) | A@far → RE-emitted (state gone)."""
    import pandas as pd
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    far = t0 + pd.Timedelta(days=10)
    mk = lambda rows: pd.DataFrame(rows, columns=["k", "ts"])
    src = _stage_files(tmpdir_session, "dedup_evict_src", [
        mk([("A", t0)]),
        mk([("S", far)]),
        mk([("B", t0)]),
        mk([("A", far)]),
    ])
    schema = spark.read.parquet(src).schema
    stream = (_as_tz(spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", 1).parquet(src))
              .withWatermark("ts", "1 hour"))
    q = (stream.dropDuplicatesWithinWatermark(["k"])
         .writeStream.format("memory").queryName("t_dedup_evict")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["k"], str(r["ts"])) for r in
                 spark.table("t_dedup_evict").collect())
    assert got == [("A", "2024-01-01 00:00:00"),
                   ("A", "2024-01-11 00:00:00"),   # re-admitted after eviction
                   ("B", "2024-01-01 00:00:00"),   # late but first-seen → kept
                   ("S", "2024-01-11 00:00:00")], got
