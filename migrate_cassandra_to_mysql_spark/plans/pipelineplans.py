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


@register(
    "pyds_pushdown_scan",
    oracle="""
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_totalprice > 150000 AND o_orderstatus IN ('O', 'F')
GROUP BY o_orderstatus
""",
)
def pyds_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full relational read path through the Python DataSource V2 connector
    (sources/pydatasource.py): stage orders into sqlite, scan it back with
    8 key-range splits, and let Catalyst push the filters into the
    connector (pushFilters -> per-split WHERE). The aggregate over the
    connector scan must equal the same aggregate over the parquet source —
    proving the pushdown dropped no rows and the splits are disjoint and
    complete. This is the reference's whole read side (token-range splits +
    server-side predicates, snapshot_use_pyspark.py:107-137,216-224) as
    one oracle-checked query."""
    from migrate_cassandra_to_mysql_spark.sources import pydatasource

    db = tempfile.mkdtemp(prefix="mc2m_pyds_") + "/orders.db"
    rows = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    )
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY,"
        " o_orderstatus VARCHAR, o_totalprice DOUBLE)"
    )
    con.executemany("INSERT INTO orders VALUES (?,?,?)", [tuple(r) for r in rows])
    con.commit()
    con.close()

    pydatasource.register(spark)
    scan = (
        spark.read.format(pydatasource.FORMAT_NAME)
        .option("path", db)
        .option("table", "orders")
        .option("partitionColumn", "o_orderkey")
        .option("numPartitions", "8")
        .load()
    )
    return (
        scan.where(
            (F.col("o_totalprice") > 150000)
            & F.col("o_orderstatus").isin("O", "F")
        )
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_price"),
        )
    )
