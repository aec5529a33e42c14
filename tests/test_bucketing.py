"""Bucketed co-located join: writing both sides bucketed by the join key
must eliminate the join-time shuffle (the 100 TB strategy for repeated
joins on the same key — shuffle once at write, never again)."""

from __future__ import annotations

import tempfile

import pytest

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf; give the database an explicit LOCATION
    # instead so nothing is written into the repo.
    warehouse = tempfile.mkdtemp(prefix="mc2m_wh_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{warehouse}'")
    (
        T(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt.lineitem_b")
    )
    (
        T(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt.orders_b")
    )
    yield "bkt.lineitem_b", "bkt.orders_b"
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li, o = spark.table(li_name), spark.table(o_name)
    # Force the sort-merge path (test data is broadcast-sized; at 100 TB
    # neither side would be).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # Co-located buckets: no Exchange (shuffle) on either join input.
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_name, o_name = bucketed_tables
    li_b, o_b = spark.table(li_name), spark.table(o_name)
    bucketed = li_b.join(o_b, li_b["l_orderkey"] == o_b["o_orderkey"]).count()
    li_p, o_p = T(spark, sf_dir, "lineitem"), T(spark, sf_dir, "orders")
    plain = li_p.join(o_p, li_p["l_orderkey"] == o_p["o_orderkey"]).count()
    assert bucketed == plain
