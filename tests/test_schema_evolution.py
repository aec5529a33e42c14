"""Schema evolution on the parquet scan layer: a table whose newer files
carry added columns must read as the union schema with NULL backfill —
the append-only lake contract a long-lived 100 TB table depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_merge_schema_unions_and_backfills(spark, sf_dir, tmp_path):
    d = str(tmp_path / "evolving")
    v1 = T(spark, sf_dir, "region").select("r_regionkey", "r_name")
    v1.write.parquet(d)
    v2 = T(spark, sf_dir, "region").select(
        "r_regionkey", "r_name", F.lit("2026-08").alias("ingest_month")
    )
    v2.write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"r_regionkey", "r_name", "ingest_month"}
    n = v1.count()
    assert merged.count() == 2 * n
    # old files backfill the new column with NULL; new files carry it
    assert merged.where(F.col("ingest_month").isNull()).count() == n
    assert merged.where(F.col("ingest_month") == "2026-08").count() == n


def test_without_merge_schema_first_footer_wins(spark, sf_dir, tmp_path):
    # documents the default contract so nobody relies on it by accident:
    # without mergeSchema the unified schema comes from a sampled footer
    # and the added column may be silently absent
    d = str(tmp_path / "evolving2")
    T(spark, sf_dir, "region").select("r_regionkey").write.parquet(d)
    plain = spark.read.parquet(d)
    assert "ingest_month" not in plain.columns
