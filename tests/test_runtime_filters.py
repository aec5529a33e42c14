"""Runtime bloom-filter injection: Spark's AQE-era runtime row filtering.

At 100 TB the classic win is a selective dimension predicate pruning a fact
scan it doesn't syntactically touch: Catalyst builds a bloom filter over the
filtered creation side and injects `bloom_filter_might_contain` onto the
application (fact) side, dropping non-joining rows BEFORE the shuffle. This
replaces hand-built semi-join pre-filters; the engine relies on it rather
than re-implementing it, so these tests pin (a) the conf surface exists and
(b) injection actually fires on this Spark build when thresholds admit it.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def runtime_filter_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # sf-test scans are tiny; drop the size gates so injection fires.
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # broadcast joins use the broadcast itself for pruning; force a
        # shuffle join so the bloom path is the one under test.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_fact_side(spark, sf_dir, runtime_filter_confs):
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), plan


def test_bloom_filter_preserves_results(spark, sf_dir, runtime_filter_confs):
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    with_filter = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    assert with_filter == without
