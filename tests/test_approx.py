"""Sketch-aggregate accuracy contract: estimates within tolerance of
exact answers (the property an oracle can't check across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans import catalog
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = catalog.queries()["approx_distinct_stats"](spark, sf_dir).collect()[0]
    li = T(spark, sf_dir, "lineitem")
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    assert abs(row["approx_orders"] - exact_orders) / exact_orders < 0.05
    assert abs(row["approx_parts"] - exact_parts) / exact_parts < 0.05
    assert row["n_rows"] == li.count()


def test_approx_percentile_brackets_exact(spark, sf_dir):
    row = catalog.queries()["approx_distinct_stats"](spark, sf_dir).collect()[0]
    li = T(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    ).collect()[0]
    p50, p95 = row["price_quantiles"]
    assert abs(p50 - exact["p50"]) / exact["p50"] < 0.05
    assert abs(p95 - exact["p95"]) / exact["p95"] < 0.05
