"""Reshaping + function-breadth catalog: pivot/unpivot, sliding window
frames, regexp suite, higher-order array functions, and exact-sum
correlation statistics.

The reference (quyetmv/migrate-cassandra-to-mysql) has none of these —
its query surface stops at projection/filter/count
(snapshot_use_pyspark.py:453-458) — but a user moving an analytics
workload onto this engine needs the full reshaping/function surface, so
they are first-class oracle-checked catalog entries (SURVEY §2.5/2.6
"absent" rows).

Determinism notes (beyond registry.py's global rules):
  - PIVOT counts: Spark's pivot yields NULL for absent (year,status)
    cells while DuckDB's ``count(*) FILTER`` yields 0 — the Spark side
    coalesces counts to 0. Sums stay NULL on both sides.
  - Moving averages come from exact decimal window sums divided at the
    end, not avg() OVER — identical frames fold identical decimals, so
    the final double is bit-identical.
  - corr/covar are computed from exact decimal sums (sum, sum-of-
    squares, sum-of-products) with the *same* final double arithmetic on
    both sides; streaming moment aggregates (Welford) would drift at the
    ulp level between engines.
  - Array sums fold float->double element-wise left-to-right in both
    engines (Spark ``aggregate`` is a left fold; DuckDB ``list_aggregate
    'sum'`` accumulates in list order), rounded to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

_DEC_PRICE = "CAST(o_totalprice AS DECIMAL(18,2))"


@register(
    "pivot_status_by_year",
    oracle=f"""
SELECT year(o_orderdate) AS order_year,
       CAST(count(*) FILTER (o_orderstatus='O') AS BIGINT) AS n_open,
       CAST(count(*) FILTER (o_orderstatus='F') AS BIGINT) AS n_filled,
       CAST(count(*) FILTER (o_orderstatus='P') AS BIGINT) AS n_pending,
       CAST(sum({_DEC_PRICE}) FILTER (o_orderstatus='O') AS DOUBLE) AS sum_open,
       CAST(sum({_DEC_PRICE}) FILTER (o_orderstatus='F') AS DOUBLE) AS sum_filled,
       CAST(sum({_DEC_PRICE}) FILTER (o_orderstatus='P') AS DOUBLE) AS sum_pending
FROM orders GROUP BY 1
""",
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long->wide): order count + exact revenue per status column,
    one row per year. The pivot values are declared explicitly ('O','F',
    'P') so Spark skips the extra distinct-scan job and the plan is a
    single partial+final aggregate — at 100 TB an undeclared pivot adds
    a full pass over the fact table just to enumerate keys."""
    o = T(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(sum({_DEC_PRICE}) AS DOUBLE)").alias("s"),
        )
    )
    return wide.select(
        "order_year",
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).alias("n_pending"),
        F.col("O_s").alias("sum_open"),
        F.col("F_s").alias("sum_filled"),
        F.col("P_s").alias("sum_pending"),
    )


@register(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey AS part_key, 'p_size' AS measure_name,
       CAST(p_size AS DOUBLE) AS measure_value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
FROM part
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide->long): part measures melted to (key, name, value)
    rows via the native unpivot operator — an Expand node, one scan, no
    join/union of N scans, so it stays a single pass at any width."""
    p = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["part_key"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure_name",
        valueColumnName="measure_value",
    )


@register(
    "moving_order_spend",
    oracle="""
SELECT o_custkey AS cust_key, o_orderkey AS order_key,
       CAST(row_number() OVER wo AS BIGINT) AS order_seq,
       CAST(count(*) OVER w3 AS BIGINT) AS mov_n_3,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
         AS mov_sum_3,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
             / (count(*) OVER w3), 6) AS mov_avg_3,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wc AS DOUBLE)
         AS cum_spend
FROM orders
WINDOW
  wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def moving_order_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window frames: per-customer trailing-3-order sum/avg and
    running (cumulative) spend. All four window functions share ONE
    partition+sort spec, so Catalyst plans a single Exchange + single
    Sort — the frame differences (ROWS 2 PRECEDING vs UNBOUNDED) are
    evaluated in the same pass. Moving avg = exact decimal window sum /
    frame count (module docstring)."""
    o = T(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = base.rowsBetween(-2, 0)
    wc = base.rowsBetween(Window.unboundedPreceding, 0)
    dec_sum = F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
    mov_sum = dec_sum.over(w3).cast("double")
    mov_n = F.count(F.lit(1)).over(w3)
    return o.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.row_number().over(base).cast("bigint").alias("order_seq"),
        mov_n.alias("mov_n_3"),
        mov_sum.alias("mov_sum_3"),
        F.round(mov_sum / mov_n, 6).alias("mov_avg_3"),
        dec_sum.over(wc).cast("double").alias("cum_spend"),
    )


@register(
    "regexp_showcase",
    oracle="""
SELECT p_partkey AS part_key,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
       CASE WHEN regexp_matches(p_name, 'w.dget') THEN 1 ELSE 0 END AS is_widget
FROM part
""",
)
def regexp_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: extract (group capture), replace-all,
    extract_all count, and rlike predicate — all JVM-side codegen'd
    expressions (no UDF). Note the cross-engine dialect trap this query
    pins down: Spark's regexp_replace is replace-ALL by default while
    DuckDB needs the explicit 'g' flag."""
    p = T(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_key"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias(
            "n_vowels"
        ),
        F.when(F.col("p_name").rlike("w.dget"), 1).otherwise(0).alias("is_widget"),
    )


@register(
    "array_hof_showcase",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       round(list_aggregate(list_transform(embedding,
                                           x -> CAST(x AS DOUBLE)), 'sum'), 4)
         AS sum_v,
       round(list_aggregate(list_transform(embedding,
                                           x -> abs(CAST(x AS DOUBLE))), 'max'), 6)
         AS max_abs
FROM embeddings
""",
)
def array_hof_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: filter
    (lambda predicate), aggregate (left fold), transform+array_max — the
    building blocks the ANN/centroid operators compose, shown bare. All
    evaluated JVM-side per-row with no explode, no shuffle, no UDF: a
    pure map stage at any scale."""
    e = T(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("sum_v"),
        F.round(
            F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))), 6
        ).alias("max_abs"),
    )


@register(
    "corr_covar_stats",
    oracle="""
WITH s AS (
  SELECT l_returnflag AS flag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1)
SELECT flag, n,
       round((sxy - sx*sy/n) / n, 4) AS covar_pop,
       round((sxy - sx*sy/n)
             / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS corr
FROM s
""",
)
def corr_covar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (covariance, Pearson correlation) per return
    flag, from exact decimal sums — one partial+final aggregate over the
    fact table, then O(groups) double arithmetic. See module docstring
    for why this beats corr()/covar_pop() builtins for cross-engine
    reproducibility."""
    li = T(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sx"),
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sy"),
        F.expr(
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))"
            " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sxy"),
        F.expr(
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))"
            " * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "flag",
        "n",
        F.round((sxy - sx * sy / n) / n, 4).alias("covar_pop"),
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            6,
        ).alias("corr"),
    )


@register(
    "fuzzy_name_dedup",
    oracle="""
WITH n AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
         split_part(p_name, ' ', 2) AS noun
  FROM part GROUP BY 1, 3)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM n a JOIN n b
  ON a.noun = b.noun AND a.p_name < b.p_name
 AND levenshtein(a.p_name, b.p_name) <= 2
""",
)
def fuzzy_name_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity resolution over part names: pairs of DISTINCT
    names within 2 edits, blocked on the product noun (second word).

    The scale-critical move is canonicalize-then-compare: the quadratic
    comparator runs over DISTINCT names (vocabulary-sized — 64 at
    sf0.01, bounded by the color x noun vocabulary, NOT by row count),
    never over the raw table, so a 100 TB corpus first collapses to its
    name vocabulary with one map-side-partial groupBy, then the blocked
    self-join is broadcast-sized. Blocking on the noun bounds each
    comparison block; levenshtein() is JVM codegen (no UDF). The same
    shape (distinct -> block -> edit-distance -> verify) is the standard
    record-linkage pipeline (Fellegi-Sunter blocking)."""
    p = T(spark, sf_dir, "part")
    n = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .withColumn("noun", F.split("p_name", " ").getItem(1))
    )
    a = n.alias("a")
    b = F.broadcast(n.alias("b"))
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name"))
            & (dist <= 2),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )
