"""Stateful streaming sessionization: must agree with the batch window
implementation on a replayed stream, and carry state across micro-batches."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.streaming.stateful import sessionize_stream


def test_stream_sessionize_matches_batch(spark, sf_dir):
    work = tempfile.mkdtemp()
    events = T(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    src = f"{work}/src"
    events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .format("parquet")
        .option("path", f"{work}/out")
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in spark.read.parquet(f"{work}/out").collect()
    }

    # Batch twin (same semantics as the events_sessionize catalog query).
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(order)
    batch = (
        events.select("user_id", "event_id", "ts", gap.alias("gap_s"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.sum(
                F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1)
                .otherwise(0)
            )
            .over(running)
            .alias("session_id"),
        )
    )
    want = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in batch.collect()
    }
    assert len(got) == len(want) > 0
    assert got == want
