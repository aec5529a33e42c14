"""Scale-strategy queries: the oracle proves the *strategy* changes nothing.

Salting and merge policies alter shuffle distribution / write semantics,
never results — so each strategy query is oracle-checked against the plain
SQL it must be equivalent to. (Bucketed co-located joins are covered in
tests/test_bucketing.py since they need a writable table catalog.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.merge import merge_snapshots
from migrate_cassandra_to_mysql_spark.operators.skew import salted_join
from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "salted_skew_join",
    oracle=f"""
SELECT o_orderstatus AS status,
       count(*) AS n_items,
       CAST(sum({_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-only skew-salted join: the keys known to be hot (from prior
    stats / AQE skew reports — here a deterministic stand-in list) are
    spread over 8 salts; cold keys join untouched with salt 0, so the
    replication overhead is |hot_keys| * n_salts rows, not |orders| *
    n_salts. The oracle is the PLAIN join — salting must be invisible in
    the results, only in the shuffle distribution."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    hot = [1, 7, 32, 69, 227]  # deterministic stand-in for sampled hot keys
    joined = salted_join(
        li,
        o,
        "l_orderkey",
        "o_orderkey",
        n_salts=8,
        hot_keys=hot,
        salt_source="l_partkey",  # cheap per-row variation beats hashing all cols
    )
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("revenue"),
    )


@register(
    "snapshot_merge_upsert",
    oracle="""
WITH existing AS (
  SELECT o_orderkey AS file_id, o_totalprice AS total, o_orderstatus AS status
  FROM orders),
 incoming AS (
  SELECT o_orderkey AS file_id, o_totalprice + 1000 AS total, 'U' AS status
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS file_id, o_totalprice AS total, 'N' AS status
  FROM orders WHERE o_orderkey % 100 = 0),
 u AS (
  SELECT *, 0 AS src FROM incoming
  UNION ALL
  SELECT *, 1 AS src FROM existing)
SELECT file_id, total, status FROM (
  SELECT *, row_number() OVER (PARTITION BY file_id
                               ORDER BY src, total, status) AS rn
  FROM u) t
WHERE rn = 1
""",
)
def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style merge, latest-wins: updated rows replace, new rows insert,
    untouched rows survive — one key-partitioned shuffle
    (operators/merge.py). Complements the reference's first-wins INSERT
    IGNORE refresh."""
    o = T(spark, sf_dir, "orders")
    existing = o.select(
        F.col("o_orderkey").alias("file_id"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
    updates = o.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("file_id"),
        (F.col("o_totalprice") + 1000).alias("total"),
        F.lit("U").alias("status"),
    )
    inserts = o.where(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("file_id"),
        F.col("o_totalprice").alias("total"),
        F.lit("N").alias("status"),
    )
    return merge_snapshots(
        existing,
        updates.unionByName(inserts),
        key_cols=["file_id"],
        order_cols=["total", "status"],
        policy="latest_wins",
    )
