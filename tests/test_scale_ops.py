"""Salted join + merge operators: result-equivalence and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.merge import merge_snapshots
from migrate_cassandra_to_mysql_spark.operators.skew import salted_join
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4)
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    assert salted.count() == plain.count()
    s = salted.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    p = plain.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    assert s == p


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    salted = salted_join(o, li, "o_orderkey", "l_orderkey", n_salts=4, how="left")
    plain = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
    assert salted.count() == plain.count()
    assert (
        salted.where(F.col("l_orderkey").isNull()).count()
        == plain.where(F.col("l_orderkey").isNull()).count()
        > 0
    )


def test_hot_key_salted_join_equals_plain_join(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    salted = salted_join(
        li, o, "l_orderkey", "o_orderkey", n_salts=4, hot_keys=[1, 7, 32]
    )
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    assert salted.count() == plain.count()
    s = salted.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    p = plain.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    assert s == p


def test_hot_key_salting_replicates_only_hot_rows(spark):
    """Cold keys must NOT be replicated: build-side blowup is |hot|*n_salts."""
    facts = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k2 long, v string"
    )
    out = salted_join(facts, dim, "k", "k2", n_salts=8, hot_keys=[3])
    assert out.count() == 1000  # identical results
    # The exploded build side: 9 cold rows * 1 salt + 1 hot row * 8 salts.
    b = dim.withColumn(
        "__salt",
        F.explode(
            F.when(
                F.array_contains(F.array(F.lit(3)), F.col("k2")),
                F.expr("sequence(0, 7)"),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    assert b.count() == 9 + 8


def test_salt_spreads_hot_key(spark):
    """A single hot key must land in multiple salted partitions."""
    hot = spark.range(0, 10000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(42, "x")], "k2 long, v string")
    out = salted_join(hot, dim, "k", "k2", n_salts=8)
    assert out.count() == 10000
    salts = (
        hot.withColumn("s", F.pmod(F.xxhash64(F.xxhash64("k", "payload")), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert salts == 8  # all 8 partitions used for the one hot key


def test_merge_first_wins_is_insert_ignore(spark):
    existing = spark.createDataFrame([(1, "old"), (2, "old")], "k long, v string")
    incoming = spark.createDataFrame([(2, "new"), (3, "new")], "k long, v string")
    out = {
        r["k"]: r["v"]
        for r in merge_snapshots(
            existing, incoming, ["k"], ["v"], policy="first_wins"
        ).collect()
    }
    assert out == {1: "old", 2: "old", 3: "new"}


def test_merge_latest_wins_upserts(spark):
    existing = spark.createDataFrame([(1, "old"), (2, "old")], "k long, v string")
    incoming = spark.createDataFrame([(2, "new"), (3, "new")], "k long, v string")
    out = {
        r["k"]: r["v"]
        for r in merge_snapshots(
            existing, incoming, ["k"], ["v"], policy="latest_wins"
        ).collect()
    }
    assert out == {1: "old", 2: "new", 3: "new"}


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    li = spark.range(10).withColumnRenamed("id", "k")
    o = spark.range(10).withColumnRenamed("id", "k2")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join cannot preserve"):
            salted_join(li, o, "k", "k2", how=how)
