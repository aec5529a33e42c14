"""Streaming exactly-once dedup: dropDuplicatesWithinWatermark gives
bounded-state dedup on an unbounded stream — the streaming twin of the
snapshot pipeline's key dedup (J3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_stream_dedup_within_watermark(spark, sf_dir):
    work = tempfile.mkdtemp()
    events = T(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # Source with every event duplicated (at-least-once delivery simulation).
    dup_src = f"{work}/src"
    events.unionAll(events).write.parquet(dup_src)

    stream = spark.readStream.schema(spark.read.parquet(dup_src).schema).parquet(
        dup_src
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .format("parquet")
        .option("path", f"{work}/out")
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(f"{work}/out")
    n_unique = events.select("event_id").distinct().count()
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique
