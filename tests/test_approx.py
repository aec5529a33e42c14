"""Sketch-aggregate accuracy contracts: estimates within tolerance of exact
answers. The KMV sketch is also oracle-checked (deterministic across
engines); the native HLL++/approx_percentile paths are implementation-
specific, so their accuracy contract lives here instead of an oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans import catalog
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_kmv_estimates_within_tolerance(spark, sf_dir):
    rows = {
        r["key_name"]: r
        for r in catalog.queries()["approx_distinct_stats"](spark, sf_dir).collect()
    }
    li = T(spark, sf_dir, "lineitem")
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        exact = li.select(col).distinct().count()
        row = rows[col]
        # md5-hash collisions are negligible at test scale.
        assert row["n_exact"] == exact
        # KMV with k=64 has rsd ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma.
        assert abs(row["kmv_estimate"] - exact) / exact < 0.51
        assert abs(row["rel_err_pct"]) < 51.0


def test_kmv_exact_below_k(spark, sf_dir):
    # l_suppkey has < 64 distinct values at sf0.001 -> estimator must
    # return the exact count, not extrapolate.
    li = T(spark, sf_dir, "lineitem")
    n_supp = li.select("l_suppkey").distinct().count()
    if n_supp < 64:
        rows = {
            r["key_name"]: r
            for r in catalog.queries()["approx_distinct_stats"](
                spark, sf_dir
            ).collect()
        }
        assert rows["l_suppkey"]["kmv_estimate"] == float(n_supp)


def test_native_hll_within_rsd(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    ).collect()[0]
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    assert abs(row["approx_orders"] - exact_orders) / exact_orders < 0.05
    assert abs(row["approx_parts"] - exact_parts) / exact_parts < 0.05


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias(
            "q"
        ),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    ).collect()[0]
    p50, p95 = row["q"]
    assert abs(p50 - row["p50"]) / row["p50"] < 0.05
    assert abs(p95 - row["p95"]) / row["p95"] < 0.05


class TestCmsHeavyHitters:
    def test_one_sided_error_and_recall(self, spark, sf_dir):
        """CMS guarantees est >= truth (hash collisions only ADD), and
        every true heavy hitter crosses the estimate threshold (no
        false negatives). Both checked row by row against the exact
        counts the catalog row carries alongside."""
        from migrate_cassandra_to_mysql_spark.plans.statsplans import (
            _CMS_FRAC,
            cms_heavy_hitters,
        )
        from pyspark.sql import functions as F
        from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

        out = cms_heavy_hitters(spark, sf_dir).toPandas()
        assert len(out) > 0
        assert (out["est"] >= out["true_cnt"]).all()
        # no false negatives: every token whose TRUE count crosses the
        # cut appears (est >= truth >= cut)
        d = T(spark, sf_dir, "documents")
        tok = d.where(F.col("text").isNotNull()).select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
        truth = tok.groupBy("tok").count().toPandas()
        total = int(truth["count"].sum())
        cut = total // _CMS_FRAC
        true_heavy = set(truth[truth["count"] >= cut]["tok"])
        assert true_heavy <= set(out["tok"])
        # ordering: est desc, tok asc
        key = list(zip(-out["est"], out["tok"]))
        assert key == sorted(key)
