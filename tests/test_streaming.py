"""Structured Streaming snapshot tests: AvailableNow drain, restart
idempotency, watermarked windowed aggregation."""

from __future__ import annotations

import glob
import tempfile

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import (
    snapshot_stream,
    windowed_event_counts,
)


def test_snapshot_stream_drains_then_noop_on_restart(spark, sf_dir):
    work = tempfile.mkdtemp()
    out_dir, ckpt = f"{work}/out", f"{work}/ckpt"
    seen_batches = []

    def handler(df, batch_id):
        seen_batches.append(batch_id)
        # batchId-keyed idempotent sink: one output dir per batch, overwrite.
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    # File stream sources need a directory; stage the table into one.
    src = f"{work}/src"
    T(spark, sf_dir, "orders").write.parquet(src)
    snapshot_stream(spark, src, ckpt, handler)
    n_first = len(seen_batches)
    assert n_first >= 1
    got = spark.read.parquet(f"{out_dir}/batch=*").count()
    want = T(spark, sf_dir, "orders").count()
    assert got == want

    # Restart with same checkpoint: nothing new -> no batches re-run.
    snapshot_stream(spark, src, ckpt, handler)
    assert len(seen_batches) == n_first

    # Checkpoint dir actually recorded commits.
    assert glob.glob(f"{ckpt}/commits/*")


def test_windowed_event_counts_matches_batch(spark, sf_dir):
    """Streaming windowed agg over the events table == batch equivalent."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp()
    batch_events = T(spark, sf_dir, "events")
    # Re-write as a clean micro-batch source (micros timestamps).
    src = f"{work}/events_src"
    batch_events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = windowed_event_counts(spark, stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .format("parquet")
        .option("path", f"{work}/out")
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(f"{work}/out")
    expect = (
        batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .count()
    )
    # AvailableNow + watermark: windows older than (max ts - watermark) are
    # finalized and emitted; the final (open) windows may be withheld. So
    # the streamed result must be a subset of batch with matching counts.
    got_rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()
    }
    exp_rows = {
        (r["win"]["start"], r["event_type"]): r["count"] for r in expect.collect()
    }
    assert got_rows, "stream emitted nothing"
    for k, v in got_rows.items():
        assert exp_rows[k] == v


def test_sliding_window_stream_matches_batch(spark, sf_dir):
    """SLIDING (overlapping) windows under watermark + append mode: every
    emitted (window, type) must match the batch F.window(2h, 1h) twin —
    the streaming twin of the events_sliding_windows catalog query. Each
    event lands in two windows, so this also verifies the per-row window
    expansion survives the streaming state path."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp()
    batch_events = T(spark, sf_dir, "events")
    src = f"{work}/events_src"
    batch_events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .format("parquet")
        .option("path", f"{work}/out")
        .start()
    )
    q.awaitTermination()

    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(f"{work}/out").collect()
    }
    expect = {
        (r["win"]["start"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert expect[k] == v
    # closed-window coverage: everything older than the final watermark
    # horizon must have been emitted, not withheld
    max_start = max(k[0] for k in expect)
    for k, v in expect.items():
        if (max_start - k[0]).total_seconds() > 4 * 3600:
            assert k in got, f"closed window {k} never emitted"


def test_session_window_stream_matches_batch(spark, sf_dir):
    """Native session_window under watermark + append mode: every emitted
    (user, session) must equal its batch twin (the
    events_session_window_native catalog query), and only sessions
    closed relative to the final watermark may emit — streamed output is
    a prefix-subset of batch, never a contradiction of it."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp()
    batch_events = T(spark, sf_dir, "events")
    src = f"{work}/sess_src"
    batch_events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    def sess_agg(df):
        return (
            df.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("win")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.col("win.start").alias("session_start"),
                "n_events",
            )
        )

    q = (
        sess_agg(stream.withWatermark("ts", "1 hour"))
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/sess_ckpt")
        .outputMode("append")
        .format("parquet")
        .option("path", f"{work}/sess_out")
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(f"{work}/sess_out").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sess_agg(batch_events).collect()
    }
    assert got, "no sessions emitted"
    # every streamed session agrees exactly with the batch twin
    for k, n in got.items():
        assert want[k] == n, k
    # withheld sessions (if any) are only those still open at the final
    # watermark — i.e. near the max event time
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    for k in set(want) - set(got):
        uid, start = k
        assert (max_ts - start).total_seconds() < 2 * 3600, k
