"""Kafka source config + streaming->relational sink job + RocksDB state.

The Kafka connector jar and a broker are absent in this environment, so
the Kafka tests cover the pure surface (option text, payload decoding
over the standard record shape); the streaming sink job runs end-to-end
against sqlite, including restart and replay idempotency; the RocksDB
test runs a real stateful stream with the RocksDB state store provider.
"""

from __future__ import annotations

import glob
import sqlite3
import tempfile

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sinks.idempotent import (
    SQLITE,
    sqlite_connection_factory,
)
from migrate_cassandra_to_mysql_spark.sources.kafka import (
    KafkaSourceConfig,
    decode_json_payload,
    kafka_options,
)
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.streaming.jdbc_stream import (
    stream_to_relational,
)
from migrate_cassandra_to_mysql_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    rocksdb_state_conf,
)


def test_kafka_options_text():
    cfg = KafkaSourceConfig(
        bootstrap_servers="b1:9092,b2:9092",
        starting_offsets="earliest",
        max_offsets_per_trigger=1000,
        min_partitions=64,
    )
    opts = kafka_options("cdc.files", cfg)
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "cdc.files"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "1000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "true"

    # Backpressure / oversubscription knobs are optional.
    bare = kafka_options("t", KafkaSourceConfig(max_offsets_per_trigger=None))
    assert "maxOffsetsPerTrigger" not in bare
    assert "minPartitions" not in bare


def test_decode_json_payload_roundtrip(spark, sf_dir):
    """Kafka record shape (binary value) -> typed columns, with source
    coordinates preserved. Built from the events table's JSON props so the
    decode path sees realistic payloads."""
    e = T(spark, sf_dir, "events").limit(200)
    records = e.select(
        F.lit("cdc.events").alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
    )
    decoded = decode_json_payload(records, "k BIGINT")
    rows = decoded.collect()
    assert len(rows) == 200
    assert set(decoded.columns) == {
        "topic", "partition", "offset", "kafka_ts", "key", "k",
    }
    # Spot-check payload values against a direct parse of props.
    want = {
        r["event_id"]: r["k"]
        for r in e.select(
            "event_id", F.from_json("props", "k BIGINT")["k"].alias("k")
        ).collect()
    }
    for r in rows:
        assert r["k"] == want[r["offset"]]


def _count(db: str, table: str) -> int:
    with sqlite3.connect(db) as conn:
        return conn.execute(f"SELECT count(*) FROM {table}").fetchone()[0]


def test_stream_to_relational_exactly_once_per_key(spark, sf_dir):
    """File stream -> sqlite through the idempotent sink: drains all data,
    restart is a no-op, new files flow incrementally, and replayed keys
    (at-least-once delivery) do not duplicate."""
    work = tempfile.mkdtemp()
    src, ckpt, db = f"{work}/src", f"{work}/ckpt", f"{work}/sink.db"
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_orders = orders.count()
    orders.write.parquet(src)
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE orders_sink ("
            "o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT,"
            " o_totalprice DOUBLE)"
        )

    def run():
        return stream_to_relational(
            spark,
            src,
            ckpt,
            lambda: sqlite_connection_factory(db),
            "orders_sink",
            dialect=SQLITE,
            batch_size=500,
            sink_partitions=1,  # sqlite: single writer
        )

    assert len(run()) >= 1
    assert _count(db, "orders_sink") == n_orders

    # Restart with nothing new: no batches run, sink unchanged.
    assert run() == []
    assert _count(db, "orders_sink") == n_orders

    # New file arrives, overlapping half its keys with already-sunk rows
    # (at-least-once replay): only the genuinely new keys land.
    replay = orders.limit(50)
    fresh = orders.select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    ).limit(30)
    replay.unionAll(fresh).coalesce(1).write.mode("append").parquet(src)
    assert len(run()) >= 1
    assert _count(db, "orders_sink") == n_orders + 30


def test_rocksdb_state_store_stateful_stream(spark, sf_dir):
    """A watermarked streaming dedup runs on the RocksDB state store
    provider and produces exact results; the checkpoint shows RocksDB
    artifacts (changelog/zip), proving the provider was actually used."""
    conf = rocksdb_state_conf(bounded_memory_mb=512)
    assert conf["spark.sql.streaming.stateStore.providerClass"] == ROCKSDB_PROVIDER
    work = tempfile.mkdtemp()
    src = f"{work}/src"
    e = T(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # Duplicate every event (at-least-once source), then stream-dedup.
    e.unionAll(e).write.parquet(src)
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
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
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    got = spark.read.parquet(f"{work}/out")
    assert got.count() == e.count()
    assert got.select("event_id").distinct().count() == e.count()
    state_files = glob.glob(f"{work}/ckpt/state/**/*", recursive=True)
    assert any(
        f.endswith((".changelog", ".zip")) for f in state_files
    ), f"no RocksDB artifacts under state/: {state_files[:10]}"
