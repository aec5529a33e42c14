"""Parquet source for the driver testdata star schema.

At 100 TB these reads become partitioned-directory scans; everything here is
plain `spark.read.parquet` so Catalyst handles column pruning, predicate
pushdown (`PushedFilters` in explain), and partition pruning for free —
the reference had to hand-build the equivalent with per-range CQL predicates
(`snapshot_use_pyspark.py:216-224`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Column pruning/pushdown left to Catalyst.

    Pins the session timezone to UTC: the DuckDB oracle reads parquet
    timestamps as naive-UTC, so timestamp literals in catalog queries and
    collected results must be interpreted in UTC regardless of which
    SparkSession (ours or the driver's) executes the plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Some testdata generations store events.ts as TIMESTAMP(NANOS),
        # which the vectorized parquet reader rejects; others use plain
        # TIMESTAMP(MICROS). Enable the nanos-as-long escape hatch, then
        # branch on the type the reader actually produced: a LongType ts is
        # raw nanos and is converted exactly (integer div — double math
        # would lose precision at ~1e18 nanos); a timestamp ts passes
        # through untouched. The DuckDB oracle mirrors the nanos case with
        # CAST(ts AS TIMESTAMP), which also truncates nanos -> micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            # TIMESTAMP(MICROS) parquet surfaces as TIMESTAMP_NTZ; the
            # engine standardizes on TIMESTAMP (LTZ) — watermarks reject
            # NTZ event time, and the session TZ is pinned UTC above so the
            # cast is value-identical to what timestamp_micros() produced.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` plans work too."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
