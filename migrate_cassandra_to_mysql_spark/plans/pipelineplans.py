"""End-to-end pipeline queries: streaming snapshot + idempotent sink.

These execute a real side-effecting pipeline (Structured Streaming drain /
foreachPartition sink write) and return its verification result as a
DataFrame, oracle-checked against the source count — i.e. the reference's
own correctness criterion (`snapshot_use_pyspark.py:372-404`: migrated
count must equal source count, diff=0).
"""

from __future__ import annotations

import functools
import sqlite3
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sinks import idempotent as sink
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import snapshot_stream


@register(
    "streaming_snapshot_drain",
    oracle="""
SELECT 'orders' AS table_name, count(*) AS migrated_rows,
       count(*) AS source_rows, CAST(0 AS BIGINT) AS diff, 'OK' AS status
FROM orders
""",
)
def streaming_snapshot_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-as-stream: drain the orders table via Trigger.AvailableNow +
    foreachBatch into a batchId-keyed parquet sink, then reconcile counts.
    The streaming checkpoint replaces the reference's checkpoint table +
    wave loop (snapshot_use_pyspark.py:143-177,465-478)."""
    work = tempfile.mkdtemp(prefix="mc2m_stream_")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"
    orders = T(spark, sf_dir, "orders")
    orders.write.parquet(src)

    def handler(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    snapshot_stream(spark, src, ckpt, handler)

    migrated = spark.read.parquet(f"{out}/batch=*").agg(
        F.count(F.lit(1)).alias("migrated_rows")
    )
    source = orders.agg(F.count(F.lit(1)).alias("source_rows"))
    return (
        migrated.crossJoin(source)
        .withColumn("diff", F.abs(F.col("migrated_rows") - F.col("source_rows")))
        .withColumn(
            "status",
            F.when(F.col("diff") == 0, F.lit("OK")).otherwise(F.lit("MISMATCH")),
        )
        .select(
            F.lit("orders").alias("table_name"),
            "migrated_rows",
            "source_rows",
            "diff",
            "status",
        )
    )


@register(
    "idempotent_sink_roundtrip",
    oracle="""
SELECT 'orders' AS table_name, count(DISTINCT o_orderkey) AS sink_rows,
       'OK' AS rerun_status
FROM orders
""",
)
def idempotent_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders through the idempotent INSERT-IGNORE sink TWICE (second
    run simulates a full task-retry wave), then verify the sink holds
    exactly one row per key — the INSERT IGNORE + unique-key contract
    (snapshot_use_pyspark.py:455-458, mysql-init/init.sql:27)."""
    db = tempfile.mkdtemp(prefix="mc2m_sink_") + "/sink.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE dst (file_id INTEGER PRIMARY KEY, total REAL)")
    con.commit()
    con.close()

    df = (
        T(spark, sf_dir, "orders")
        .selectExpr("o_orderkey AS file_id", "o_totalprice AS total")
        .repartition(4)
    )
    factory = functools.partial(sink.sqlite_connection_factory, db)
    for _ in range(2):
        sink.write_idempotent(df, factory, "dst", dialect=sink.SQLITE, batch_size=2000)

    con = sqlite3.connect(db)
    n = con.execute("SELECT count(*) FROM dst").fetchone()[0]
    con.close()
    return spark.createDataFrame(
        [("orders", n, "OK")], "table_name string, sink_rows long, rerun_status string"
    )
