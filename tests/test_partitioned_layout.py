"""Partitioned-directory layout: the disk-side half of the 100 TB story.

Writing fact tables partitioned by a coarse time key means a time-bounded
query reads only its partitions — Catalyst partition pruning shows up as
PartitionFilters in the scan, before any row is touched.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_partition_pruning_on_year_partitioned_lineitem(spark, sf_dir):
    out = tempfile.mkdtemp() + "/lineitem_by_year"
    li = T(spark, sf_dir, "lineitem")
    li.withColumn("ship_year", F.year("l_shipdate")).write.partitionBy(
        "ship_year"
    ).parquet(out)

    back = spark.read.parquet(out)
    q = back.where(F.col("ship_year") == 1997)

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "ship_year" in plan.split("PartitionFilters", 1)[1][:200]

    # Pruned read returns exactly the 1997 rows.
    want = li.where(F.year("l_shipdate") == 1997).count()
    assert q.count() == want > 0


def test_partitioned_write_roundtrip_complete(spark, sf_dir):
    out = tempfile.mkdtemp() + "/li2"
    li = T(spark, sf_dir, "lineitem")
    li.withColumn("ship_year", F.year("l_shipdate")).write.partitionBy(
        "ship_year"
    ).parquet(out)
    assert spark.read.parquet(out).count() == li.count()
