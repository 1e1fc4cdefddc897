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
