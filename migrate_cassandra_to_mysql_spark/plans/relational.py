"""Relational query catalog — the reference's operator inventory (SURVEY §2)
re-expressed as declarative DataFrame plans, each with a DuckDB oracle.

Mapping to the reference (file:line into /root/reference):
  snapshot_sanitize        -> the flagship pipeline: projection/rename
                              (snapshot_use_pyspark.py:453,456), NULL
                              sanitize (:241-255), key dedup / INSERT IGNORE
                              (:455-458), token-range predicate (:219-220)
  token_range_counts       -> per-range counts (:275-277,363-366)
  snapshot_reconciliation  -> validate_counts (:372-404)
  missing_ids_anti_join    -> find_missing_ids.py:38-53
  missing_ids_enriched     -> find_missing_ids.py:59-65 (lookup join)
  checkpoint_progress      -> debug_checkpoints.py:23-37
  running_max_token        -> max_token high-water tracking (:228,258)
  dedup_exact_lineitem     -> INSERT IGNORE + uk_file_id key dedup
                              (mysql-init/init.sql:27)
plus the general relational surface an engine must expose (grouped aggs,
joins, top-k, set ops, rollup, window/sessionization, JSON extraction) that
the reference only implies (SURVEY §2.4-2.6 "absent" rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.hashing import (
    md5_token_bucket,
    oracle_bucket_sql,
)
from migrate_cassandra_to_mysql_spark.operators.reconcile import (
    snapshot_diff,
    count_reconciliation,
    missing_keys,
    per_bucket_counts,
)
from migrate_cassandra_to_mysql_spark.operators.snapshot import dedup_by_key
from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

# Exact-decimal revenue term used by q1/q3/q5 (rule 1 in registry docstring).
_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "snapshot_sanitize",
    oracle=f"""
WITH src AS (
  SELECT o_orderkey AS file_id,
         nullif(o_orderstatus, 'O') AS status_n,
         nullif(o_orderpriority, '1-URGENT') AS prio_n,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END AS date_n,
         o_totalprice AS total_price,
         o_custkey AS client_id
  FROM orders
), san AS (
  SELECT file_id,
         coalesce(status_n, '') AS status,
         coalesce(prio_n, '') AS priority,
         coalesce(date_n, TIMESTAMP '2026-01-01 00:00:00') AS modified,
         total_price, client_id,
         {oracle_bucket_sql('file_id')} AS token_bucket
  FROM src
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY file_id ORDER BY modified, status) AS rn
    FROM san) t
  WHERE rn = 1
)
SELECT file_id, status, priority, modified, total_price, client_id, token_bucket
FROM dedup WHERE token_bucket < 192
""",
)
def snapshot_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship snapshot pipeline: rename -> NULL-inject (to exercise the
    sanitize contract on NULL-free testdata) -> sanitize -> bucket -> dedup
    -> token-range filter. One declarative plan; the only shuffle is the
    dedup window, and the range filter is pushed into the scan."""
    src = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("file_id"),
        F.expr("nullif(o_orderstatus, 'O')").alias("status_n"),
        F.expr("nullif(o_orderpriority, '1-URGENT')").alias("prio_n"),
        F.expr(
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END"
        ).alias("date_n"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_custkey").alias("client_id"),
    )
    san = src.select(
        "file_id",
        F.coalesce("status_n", F.lit("")).alias("status"),
        F.coalesce("prio_n", F.lit("")).alias("priority"),
        F.coalesce(
            "date_n", F.lit("2026-01-01 00:00:00").cast("timestamp")
        ).alias("modified"),
        "total_price",
        "client_id",
        md5_token_bucket(F.col("file_id")).alias("token_bucket"),
    )
    # Range-filter BEFORE the dedup shuffle: token_bucket is a pure
    # function of file_id (the dedup key), so filter and dedup commute —
    # but Catalyst won't push a predicate on a non-partition column
    # through a window, so the plan states the cheap order explicitly.
    # 25% of rows (bucket >= 192) never enter the exchange+sort.
    return dedup_by_key(
        san.where(F.col("token_bucket") < 192), ["file_id"], ["modified", "status"]
    )


@register(
    "token_range_counts",
    oracle=f"""
SELECT {oracle_bucket_sql('l_orderkey')} AS token_bucket,
       count(*) AS n_rows,
       min(l_orderkey) AS min_key,
       max(l_orderkey) AS max_key,
       count(DISTINCT l_orderkey) AS n_keys
FROM lineitem GROUP BY 1
""",
)
def token_range_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token-range counts (A1/A5): one groupBy replaces the reference's
    256 separate per-range CQL count(*) round-trips.

    Aggregates per KEY first, then per bucket: the bucket is a pure
    function of the key, so row counts can partial-agg on the raw key
    (map-side combine, no hash evaluation) and the md5 runs once per
    DISTINCT key instead of once per row — 4x fewer hashes here, more on
    duplicate-heavier data — while count(DISTINCT key) degenerates to
    count(*), eliminating the Expand duplication a distinct-aggregate
    plan pays. Identical results to the naive form; the oracle keeps the
    naive SQL."""
    li = T(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_key.withColumn(
            "token_bucket", md5_token_bucket(F.col("l_orderkey"))
        )
        .groupBy("token_bucket")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )


@register(
    "snapshot_reconciliation",
    oracle="""
WITH src AS (SELECT count(*) AS c FROM lineitem),
 full_t AS (SELECT count(*) AS c FROM lineitem),
 lossy AS (SELECT count(*) AS c FROM lineitem
           WHERE NOT (l_orderkey % 997 = 0 AND l_linenumber = 1))
SELECT 'lineitem_full' AS table_name, src.c AS source_count,
       full_t.c AS target_count, abs(src.c - full_t.c) AS diff,
       CASE WHEN src.c = full_t.c THEN 'OK' ELSE 'MISMATCH' END AS status
FROM src, full_t
UNION ALL
SELECT 'lineitem_lossy', src.c, lossy.c, abs(src.c - lossy.c),
       CASE WHEN src.c = lossy.c THEN 'OK' ELSE 'MISMATCH' END
FROM src, lossy
""",
)
def snapshot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count reconciliation (A2-A4 + S8): source vs target counts -> diff ->
    OK/MISMATCH verdict, exercising both verdict branches via a simulated
    lossy target.

    Read amplification: the four count sides executed four lineitem
    scans. Counting only needs the two columns the lossy filter reads,
    so ONE eagerly checkpointed 2-column projection feeds all four
    count_reconciliation sides — 1 scan, identical verdict rows. (The
    trade is explicit: materializing a 2-column key projection vs N
    column-pruned count scans; at one scan per extra consumer the
    checkpoint wins from the second reference on.)"""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    ).localCheckpoint(eager=True)
    lossy = li.where(~((F.col("l_orderkey") % 997 == 0) & (F.col("l_linenumber") == 1)))
    return count_reconciliation(li, li, "lineitem_full").unionAll(
        count_reconciliation(li, lossy, "lineitem_lossy")
    )


@register(
    "missing_ids_anti_join",
    oracle="""
SELECT o_orderkey AS missing_key, o_custkey AS client_id,
       o_totalprice AS total_price, o_orderstatus AS status
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def missing_ids_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-key reconciliation (J1) as a distributed left-anti join —
    replaces the reference's driver-side set + per-id probe loop
    (find_missing_ids.py:38-53), which cannot scale past driver memory."""
    o, li = T(spark, sf_dir, "orders"), T(spark, sf_dir, "lineitem")
    return missing_keys(o, li.select("l_orderkey"), "o_orderkey", "l_orderkey").select(
        F.col("o_orderkey").alias("missing_key"),
        F.col("o_custkey").alias("client_id"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "orders_with_items_semi",
    oracle="""
SELECT o_orderkey AS order_key, o_orderstatus AS status,
       o_totalprice AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  AND o_totalprice > 200000
""",
)
def orders_with_items_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): the positive twin of the anti-join — the
    reference's per-id existence probe (find_missing_ids.py:49-50) as one
    distributed join instead of N round-trips."""
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    li = T(spark, sf_dir, "lineitem").select("l_orderkey")
    return o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
    )


@register(
    "missing_ids_enriched",
    oracle="""
WITH missing AS (
  SELECT o_orderkey, o_custkey FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
)
SELECT m.o_orderkey AS missing_key, c.c_custkey AS client_id,
       c.c_name AS client_name, c.c_mktsegment AS segment
FROM missing m JOIN customer c ON m.o_custkey = c.c_custkey
""",
)
def missing_ids_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup/enrichment join (J2): missing keys joined back to a dimension.
    Customer is dimension-sized -> broadcast hash join, no shuffle of the
    fact side."""
    o, li = T(spark, sf_dir, "orders"), T(spark, sf_dir, "lineitem")
    c = T(spark, sf_dir, "customer")
    missing = missing_keys(
        o.select("o_orderkey", "o_custkey"),
        li.select("l_orderkey"),
        "o_orderkey",
        "l_orderkey",
    )
    return missing.join(
        F.broadcast(c), missing["o_custkey"] == c["c_custkey"], "inner"
    ).select(
        F.col("o_orderkey").alias("missing_key"),
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("client_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "checkpoint_progress",
    oracle="""
SELECT o_orderkey % 16 AS range_id,
       max(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN o_orderkey END)
         AS checkpoint,
       max(o_orderkey) AS range_end,
       count(*) AS n_rows,
       CASE WHEN max(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                          THEN o_orderkey END) = max(o_orderkey)
            THEN 'DONE' ELSE 'PENDING' END AS status
FROM orders GROUP BY 1
""",
)
def checkpoint_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint progress rollup (A6/S6): per-range high-water checkpoint vs
    range_end -> DONE/PENDING, mirroring `checkpoint = range_end` done-ness
    (snapshot_use_pyspark.py:67-74, debug_checkpoints.py:23-37)."""
    o = T(spark, sf_dir, "orders")
    ckpt = F.max(
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"),
            F.col("o_orderkey"),
        )
    )
    return (
        o.groupBy((F.col("o_orderkey") % 16).alias("range_id"))
        .agg(
            ckpt.alias("checkpoint"),
            F.max("o_orderkey").alias("range_end"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn(
            "status",
            F.when(F.col("checkpoint") == F.col("range_end"), F.lit("DONE")).otherwise(
                F.lit("PENDING")
            ),
        )
    )


@register(
    "running_max_token",
    oracle="""
SELECT l_orderkey AS order_key, l_linenumber AS line_number,
       max(l_orderkey) OVER (
         PARTITION BY l_orderkey % 16
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water_key
FROM lineitem
""",
)
def running_max_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running high-water mark (W1): the reference tracks max_token while
    iterating a range (snapshot_use_pyspark.py:228,258); here it is a window
    running-max over a deterministic scan order."""
    li = T(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy(F.col("l_orderkey") % 16)
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.max("l_orderkey").over(w).alias("high_water_key"),
    )


@register(
    "dedup_exact_lineitem",
    oracle="""
SELECT l_orderkey AS order_key, l_linenumber AS line_number,
       l_quantity AS quantity, l_extendedprice AS price
FROM (SELECT *, row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_quantity, l_extendedprice,
                 l_partkey, l_suppkey) AS rn
      FROM lineitem) t
WHERE rn = 1
""",
)
def dedup_exact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic key-dedup (J3): INSERT IGNORE keeps an arbitrary
    duplicate; this engine keeps an explicitly-ordered survivor so reruns
    are idempotent (required for retry-safe writes at scale)."""
    li = T(spark, sf_dir, "lineitem")
    # The tie-break must identify a unique survivor: (orderkey, linenumber)
    # alone is NOT unique in the testdata (duplicate injections), so order by
    # enough columns to pin one physical row in both engines.
    return dedup_by_key(
        li,
        ["l_orderkey"],
        ["l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"],
    ).select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
    )


# Scaled-integer money terms for q1: values have <= 2 true decimals, so
# round(x*100) AS BIGINT is exact, long-typed sums are ~2x faster than
# decimal sums (measured), and the final integer -> DOUBLE conversion
# rounds identically in both engines. Overflow headroom: the charge term
# is <= ~1e11/row, so BIGINT sums are safe past 1e7 rows per group —
# beyond that (or for squared terms) fall back to DECIMAL (see
# order_price_stats).
_QTY_C = "CAST(round(l_quantity * 100, 0) AS BIGINT)"
_PRICE_C = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_DISC_C = "CAST(round(l_discount * 100, 0) AS BIGINT)"
_TAX_C = "CAST(round(l_tax * 100, 0) AS BIGINT)"

_Q1_AGGS = f"""
  CAST(sum({_QTY_C}) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(sum({_PRICE_C}) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sum({_PRICE_C} * (100 - {_DISC_C})) AS DOUBLE) / 10000.0
    AS sum_disc_price,
  CAST(sum({_PRICE_C} * (100 - {_DISC_C}) * (100 + {_TAX_C})) AS DOUBLE)
    / 1000000.0 AS sum_charge,
  CAST(sum({_QTY_C}) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
  CAST(sum({_PRICE_C}) AS DOUBLE) / 100.0 / count(*) AS avg_price,
  CAST(sum({_DISC_C}) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
  count(*) AS count_order
"""


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
{_Q1_AGGS}
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style grouped aggregation (the general agg surface, SURVEY
    §2.4 'absent' rows). Money math as exact scaled BIGINT (see _QTY_C
    comment) — long-speed sums, bit-identical to the oracle regardless of
    partial-agg order."""
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    agg_exprs = []
    for part in _Q1_AGGS.strip().rstrip(",").split(",\n"):
        expr, alias = part.rsplit(" AS ", 1)
        agg_exprs.append(F.expr(expr.strip()).alias(alias.strip()))
    return (
        li.groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(*agg_exprs)
    )


@register(
    "q3_top_revenue_orders",
    oracle=f"""
SELECT l_orderkey AS order_key, o_orderdate AS order_date,
       CAST(sum({_REVENUE}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, order_key
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg + deterministic top-k. The customer dimension is
    filtered then broadcast; lineitem (the 100 TB side) never shuffles for
    the join, only for the final groupBy."""
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    joined = li.join(
        F.broadcast(o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])),
        li["l_orderkey"] == o["o_orderkey"],
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
        )
        .agg(F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(sum({_REVENUE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r_name, n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join (region/nation/customer broadcast) + grouped revenue.
    Catalyst chains the three broadcast hash joins inside one codegen stage;
    only the final 25-group agg shuffles."""
    r, n = T(spark, sf_dir, "region"), T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    dim = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"]
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(dim), o["o_custkey"] == F.col("c_custkey")
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey AS order_key, o_custkey AS client_id,
       o_totalprice AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (L1 + sort): Spark runs this as TakeOrderedAndProject
    — per-partition heap + driver merge of 25 rows, no global sort."""
    return (
        T(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("client_id"),
            F.col("o_totalprice").alias("total_price"),
        )
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(25)
    )


@register(
    "segment_set_ops",
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey AS client_id FROM orders
             WHERE year(o_orderdate) = 1996),
     y97 AS (SELECT DISTINCT o_custkey AS client_id FROM orders
             WHERE year(o_orderdate) = 1997)
SELECT 'both' AS tag, client_id
FROM (SELECT client_id FROM y96 INTERSECT SELECT client_id FROM y97) t
UNION ALL
SELECT 'only_1996' AS tag, client_id
FROM (SELECT client_id FROM y96 EXCEPT SELECT client_id FROM y97) t
""",
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT / UNION ALL) — SURVEY §2.5 'absent'
    surface, exposed as one tagged result.

    Read amplification: INTERSECT and EXCEPT ALL each reference both
    year frames, so deriving y96/y97 straight from `orders` executed
    FOUR full scans (year(date) is not pushdown-able — every scan read
    the table end to end). The (year, custkey) DISTINCT frame is
    customer-sized, so both year sets derive from ONE eagerly
    checkpointed scan; the set ops then shuffle only the distinct
    frames. Same rows, one orders scan."""
    o = T(spark, sf_dir, "orders")
    base = (
        o.where(F.year("o_orderdate").isin(1996, 1997))
        .select(
            F.year("o_orderdate").alias("yr"),
            F.col("o_custkey").alias("client_id"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    y96 = base.where(F.col("yr") == 1996).select("client_id")
    y97 = base.where(F.col("yr") == 1997).select("client_id")
    both = y96.intersect(y97).select(F.lit("both").alias("tag"), "client_id")
    only96 = y96.exceptAll(y97).select(F.lit("only_1996").alias("tag"), "client_id")
    return both.unionAll(only96)


@register(
    "json_events_agg",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
)
def json_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction + agg (SURVEY §2.6: events.props is a JSON
    string). get_json_object stays JVM-side; no Python."""
    e = T(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr(
            "CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT)"
        ).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
    )


@register(
    "events_hourly_rollup",
    oracle="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type)
""",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (hour -> type -> grand total) — SURVEY §2.4
    'absent' grouping-sets surface."""
    e = T(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "event_type",
        "value",
    )
    return e.rollup("hour_ts", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
    )


@register(
    "events_sliding_windows",
    oracle="""
WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
                  event_type, value
           FROM events),
 w AS (SELECT unnest([b, b - INTERVAL 1 HOUR]) AS window_start,
              event_type, value
       FROM e)
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM w GROUP BY window_start, event_type
""",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) event-time windows: 2-hour windows sliding
    hourly, so every event lands in exactly two windows. Native
    F.window(ts, '2 hours', '1 hour') — Spark expands the per-row window
    membership map-side, then one hash aggregation; the identical
    groupBy runs unchanged under readStream + watermark (the streaming
    twin of this shape is streaming_hourly_rollup). The oracle expands
    membership explicitly (each event into buckets b and b-1h)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_gap_fill",
    oracle="""
WITH e AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                  ts, event_id, value
           FROM events),
 hourly AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_ev,
                   max({'ts': ts, 'event_id': event_id, 'value': value}).value
                     AS v
            FROM e GROUP BY 1, 2),
 spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
 grid AS (SELECT user_id,
                 unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
          FROM spans)
SELECT g.user_id, g.bucket,
       CASE WHEN h.h = g.bucket THEN h.n_ev ELSE CAST(0 AS BIGINT) END
         AS n_events,
       h.v AS filled_value,
       h.h < g.bucket AS is_gap
FROM grid g ASOF JOIN hourly h
  ON g.user_id = h.user_id AND g.bucket >= h.h
""",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with forward fill (LOCF): per user, emit one row
    for EVERY hourly bucket between that user's first and last observed
    hour; buckets with no events carry the value of the latest prior event
    (latest-within-hour tie-broken by (ts, event_id) via struct max).

    Scale shape: two shuffles total. (1) partial-agg-friendly groupBy
    (user_id, hour) collapses raw events to at most one row per observed
    hour; (2) groupBy(user_id) collects the per-user observation list —
    bounded by the series span in hours (720 for a month of hourly data),
    NOT by the raw event count, so per-user state stays small no matter how
    hot the user. The grid expansion is then pure map-side: each
    observation becomes a fill range [its hour, next observed hour), and
    one sequence() explode emits the filled buckets — no grid×events join,
    no per-bucket window scan. The oracle materializes the same grid via
    generate_series + ASOF join. Expansion bounds (chunked sequence(),
    optional max-span guard) live in gap_fill_hourly below.
    """
    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.struct("ts", "event_id", "value").alias("obs"),
    )
    return gap_fill_hourly(e)


def gap_fill_hourly(
    e: DataFrame,
    max_span_hours: int | None = None,
    chunk_hours: int = 8760,
) -> DataFrame:
    """The gap-fill engine behind events_gap_fill, with the expansion
    bounds a 100 TB deployment needs (VERDICT r6 ask #6):

      - `chunk_hours` (default one year) caps EVERY generated sequence()
        array: a fill range longer than the chunk is split map-side into
        chunk-sized sub-ranges first, so a single pathological always-on
        user spanning decades never materializes one multi-hundred-
        thousand-element array in a task (the per-row memory burst is
        bounded by chunk_hours regardless of span). For spans under the
        chunk this adds one no-op transform — same output, same shuffle
        count.
      - `max_span_hours` (optional) is a loud guard: any user whose
        first→last span exceeds it fails the job with raise_error naming
        the user, instead of silently expanding (opt-in because the
        right bound is deployment policy, not engine policy).

    Input: (user_id, h, obs struct) rows as built by events_gap_fill.
    """
    hourly = e.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max("obs").getField("value").alias("v"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("h", "v", "n_ev"))).alias("obs")
    )
    if max_span_hours is not None:
        span_h = (
            "(unix_timestamp(element_at(obs, -1).h)"
            " - unix_timestamp(get(obs, 0).h)) / 3600 + 1"
        )
        guard = F.when(
            F.expr(span_h) > max_span_hours,
            F.raise_error(
                F.concat(
                    F.lit("gap_fill: user "),
                    F.col("user_id").cast("string"),
                    F.lit(f" span exceeds max_span_hours={max_span_hours}"),
                )
            ),
        ).otherwise(F.lit("ok"))
        spans = (
            spans.withColumn("_g", guard)
            .where(F.col("_g") == "ok")
            .drop("_g")
        )
    # Each observation i covers [h_i, h_{i+1}) (the last covers just its own
    # hour: the grid ends at the user's final observed hour). get() is the
    # 0-based accessor that yields NULL past the end (bracket indexing
    # throws under ANSI), so get(obs, i + 1) is the successor and coalesce
    # catches the final element.
    ranges = spans.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(obs, (o, i) -> struct("
                "o.h AS start_h, "
                "coalesce(get(obs, i + 1).h, o.h + interval 1 hour)"
                "  AS next_h, "
                "o.v AS v, o.n_ev AS n_ev))"
            )
        ).alias("r"),
    )
    # Split each fill range into <= chunk_hours sub-ranges BEFORE the
    # sequence explode, so no single task row expands an unbounded array.
    chunked = ranges.select(
        "user_id",
        F.col("r.start_h").alias("start_h"),
        F.col("r.v").alias("v"),
        F.col("r.n_ev").alias("n_ev"),
        F.explode(
            F.expr(
                "transform("
                " sequence(0, cast(floor((unix_timestamp(r.next_h"
                "   - interval 1 hour) - unix_timestamp(r.start_h))"
                f"  / 3600 / {chunk_hours}) AS int)),"
                " ci -> struct("
                f"  r.start_h + make_interval(0, 0, 0, 0, ci * {chunk_hours})"
                "    AS c0,"
                "  least(r.next_h, r.start_h"
                f"   + make_interval(0, 0, 0, 0, (ci + 1) * {chunk_hours}))"
                "    AS c1))"
            )
        ).alias("c"),
    )
    return chunked.select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(c.c0, c.c1 - interval 1 hour, interval 1 hour)"
            )
        ).alias("bucket"),
        "start_h",
        "v",
        "n_ev",
    ).select(
        "user_id",
        "bucket",
        F.when(F.col("bucket") == F.col("start_h"), F.col("n_ev"))
        .otherwise(F.lit(0).cast("long"))
        .alias("n_events"),
        F.col("v").alias("filled_value"),
        (F.col("bucket") > F.col("start_h")).alias("is_gap"),
    )


@register(
    "customer_hierarchy_recursive",
    oracle="""
WITH RECURSIVE h(custkey, depth, path) AS (
  SELECT c_custkey, 0, CAST(c_custkey AS VARCHAR)
  FROM customer WHERE c_custkey = 0
  UNION ALL
  SELECT c.c_custkey, h.depth + 1,
         h.path || '/' || CAST(c.c_custkey AS VARCHAR)
  FROM customer c JOIN h ON c.c_custkey // 7 = h.custkey
  WHERE c.c_custkey >= 1
)
SELECT custkey, CAST(depth AS BIGINT) AS depth, path FROM h
""",
)
def customer_hierarchy_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over a referral hierarchy via Spark 4's native
    WITH RECURSIVE (the org-chart / BOM-explosion shape): parent(c) =
    c DIV 7 over the contiguous customer keys forms a deterministic
    7-ary tree rooted at custkey 0; the query materializes every node's
    depth and root-to-node path in one recursive CTE — no driver-side
    loop, no manual iteration plumbing.

    Scale shape: Catalyst executes the recursion as an iterative
    union loop — per level, ONE equi-join of the (still-unvisited)
    customer table against the previous frontier, shuffling only
    frontier-sized (custkey, depth, path) rows; depth is logarithmic in
    the customer count (parent < child strictly, so termination is
    structural). The strictly-decreasing parent key is the loop-safety
    invariant: a self-parented root would recurse forever (custkey 0 is
    therefore anchored in the base case and excluded from the step).
    This subsumes the driver-side wave loop the reference hand-rolls
    (`snapshot_only_python.py:364-371` ThreadPoolExecutor waves) for
    hierarchical expansion workloads.
    """
    T(spark, sf_dir, "customer").createOrReplaceTempView(
        "mc2m_customer_hier"
    )
    return spark.sql(
        """
WITH RECURSIVE h(custkey, depth, path) AS (
  SELECT c_custkey, 0, CAST(c_custkey AS STRING)
  FROM mc2m_customer_hier WHERE c_custkey = 0
  UNION ALL
  SELECT c.c_custkey, h.depth + 1,
         concat(h.path, '/', CAST(c.c_custkey AS STRING))
  FROM mc2m_customer_hier c JOIN h ON c.c_custkey DIV 7 = h.custkey
  WHERE c.c_custkey >= 1
)
SELECT custkey, CAST(depth AS BIGINT) AS depth, path FROM h
"""
    )


def _zorder_oracle() -> str:
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        zvalue_sql_duckdb,
    )

    z = zvalue_sql_duckdb("l_orderkey", "l_partkey")
    return f"""
WITH z AS (SELECT {z} AS z,
                  CAST(l_orderkey & 65535 AS BIGINT) AS a,
                  CAST(l_partkey & 65535 AS BIGINT) AS b
           FROM lineitem),
 m AS (SELECT (max(z) // 64) + 1 AS w FROM z)
SELECT CAST(z.z // m.w AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(a) AS min_a, max(a) AS max_a,
       min(b) AS min_b, max(b) AS max_b
FROM z, m GROUP BY 1
"""


@register("zorder_curve_rollup", oracle=_zorder_oracle())
def zorder_curve_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) curve rollup over (l_orderkey, l_partkey): rows
    bucketed into 64 equal-width segments of the interleaved z-value range, with
    each bucket's bounding rectangle in key space. This is the curve the
    layout rewriter (operators/layout.write_zordered) sorts by — the
    rollup makes its locality property oracle-checkable: each z-bucket
    covers a bounded rectangle of BOTH keys (what parquet row-group
    min/max stats need to prune 2-D box predicates), unlike a 1-D sort
    where the second key's range per bucket is unbounded.

    Scale shape: the z-value is pure integer bit arithmetic inside
    whole-stage codegen (no UDF, exact on both engines); the rollup is
    one partial-agg-friendly groupBy on a 64-value key. The write path
    (write_zordered) is one range-exchange + within-partition sort —
    global-sort cost class, paid once, recovered on every subsequent
    selective 2-D scan (row-group pruning measured in
    tests/test_zorder_layout.py against pyarrow footer stats).
    """
    from migrate_cassandra_to_mysql_spark.operators.layout import zvalue

    li = T(spark, sf_dir, "lineitem").select(
        zvalue("l_orderkey", "l_partkey").alias("z"),
        F.expr("CAST(l_orderkey & 65535 AS BIGINT)").alias("a"),
        F.expr("CAST(l_partkey & 65535 AS BIGINT)").alias("b"),
    )
    # 64 equal-width curve segments, width from a broadcast 1-row max —
    # scale-invariant bucketing (a fixed bit shift gives 1 bucket at
    # sf0.001 and 2^18 at sf0.1)
    w = li.agg(F.expr("(max(z) DIV 64) + 1").alias("w"))
    return li.crossJoin(F.broadcast(w)).groupBy(
        F.expr("CAST(z DIV w AS BIGINT)").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )


@register(
    "events_dpp_prune",
    oracle="""
WITH e AS (SELECT CAST(ts AS DATE) AS event_date, event_type, value
           FROM events),
 dim AS (SELECT event_date FROM (
   SELECT event_date, count(*) AS n,
          row_number() OVER (ORDER BY count(*) DESC, event_date) AS rn
   FROM e WHERE event_type = 'purchase' GROUP BY 1) t
   WHERE rn <= 5)
SELECT e.event_date, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM e JOIN dim USING (event_date)
GROUP BY 1, 2
""",
)
def events_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning showcase (new r7): the events fact is
    laid out date-partitioned (written once per sf_dir, memoized — the
    standard time-partitioned fact layout), and the probe dates come
    from a RUNTIME subquery (the 5 busiest purchase days), so no static
    filter exists at plan time — Catalyst instead injects a
    dynamicpruning subquery into the fact scan's PartitionFilters and
    only the 5 matching date directories are ever opened (plan-pinned in
    tests/test_plan_shapes.py). At 100 TB with daily partitions this is
    the difference between scanning 5 days and scanning years — and it
    composes with the broadcast of the tiny dim side, which is reused as
    the pruning filter for free. The oracle computes the same result
    from the unpartitioned table: partitioning is a layout property,
    never a semantic one."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    ev = T(spark, sf_dir, "events")

    def _build() -> str:
        d = workdir("mc2m_dpp_")
        ev.withColumn("event_date", F.to_date("ts")).write.mode(
            "overwrite"
        ).partitionBy("event_date").parquet(d)
        return d

    part_dir = memo(("events_by_date", sf_dir), _build)
    fact = spark.read.parquet(part_dir)
    dim = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_date"))
        .limit(5)
        .select("event_date")
    )
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )


@register(
    "orders_per_customer_listagg",
    oracle="""
SELECT o_custkey AS client_id,
       count(*) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
         AS order_keys
FROM orders
WHERE o_custkey % 20 = 0
GROUP BY o_custkey
""",
)
def orders_per_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (LISTAGG/string_agg): collect_list order is
    nondeterministic under parallel aggregation, so the portable form is
    array_sort BEFORE joining — a row-level determinism gotcha every
    distributed engine user hits."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") % 20 == 0)
    return o.groupBy(F.col("o_custkey").alias("client_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "concat_ws(',', transform(array_sort(collect_list(o_orderkey)),"
            " x -> CAST(x AS STRING)))"
        ).alias("order_keys"),
    )


@register(
    "datetime_functions_showcase",
    oracle="""
SELECT o_orderkey AS order_key,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
         AS days_since_epoch95,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_quarter
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def datetime_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar breadth (SURVEY §2.6): extraction, truncation, day
    arithmetic, end-of-month, calendar-aware month addition — aligned with
    DuckDB semantics (both engines clamp end-of-month the same way)."""
    o = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)").alias(
            "days_since_epoch95"
        ),
        F.expr("CAST(last_day(o_orderdate) AS TIMESTAMP)").alias("month_end"),
        F.expr("CAST(add_months(o_orderdate, 3) AS TIMESTAMP)").alias(
            "plus_quarter"
        ),
    )


@register(
    "full_outer_reconciliation",
    oracle="""
WITH o_agg AS (SELECT o_orderkey AS k, count(*) AS n_orders FROM orders
               GROUP BY 1),
 l_agg AS (SELECT l_orderkey AS k, count(*) AS n_items FROM lineitem
           GROUP BY 1)
SELECT coalesce(o_agg.k, l_agg.k) AS order_key,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_items, 0) AS n_items,
       CASE WHEN o_agg.k IS NULL THEN 'orphan_items'
            WHEN l_agg.k IS NULL THEN 'empty_order'
            ELSE 'matched' END AS link_status
FROM o_agg FULL OUTER JOIN l_agg ON o_agg.k = l_agg.k
""",
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join reconciliation: classifies every key as matched /
    empty_order / orphan_items in one pass — the bidirectional
    generalization of the anti-join diagnostic (J1 covers only one
    direction)."""
    o = T(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("ok")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    li = T(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("lk")
    ).agg(F.count(F.lit(1)).alias("n_items"))
    j = o.join(li, o["ok"] == li["lk"], "full_outer")
    return j.select(
        F.coalesce("ok", "lk").alias("order_key"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.when(F.col("ok").isNull(), "orphan_items")
        .when(F.col("lk").isNull(), "empty_order")
        .otherwise("matched")
        .alias("link_status"),
    )


@register(
    "window_function_suite",
    oracle="""
WITH ranked AS (
  SELECT o_custkey AS client_id, o_orderkey AS order_key,
         o_totalprice AS total_price,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         percent_rank() OVER w AS prnk,
         ntile(4) OVER w AS quartile,
         lag(o_orderkey) OVER w AS prev_key,
         lead(o_orderkey) OVER w AS next_key
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM ranked WHERE rnk <= 5
""",
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth (SURVEY §2.5 'absent' rows): rank /
    dense_rank / percent_rank / ntile / lag / lead in one pass over a
    single window definition — one shuffle, six functions."""
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("client_id"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.lag("o_orderkey").over(w).alias("prev_key"),
            F.lead("o_orderkey").over(w).alias("next_key"),
        )
        .where(F.col("rnk") <= 5)
    )


@register(
    "scalar_functions_showcase",
    oracle="""
SELECT c_custkey AS client_id,
       upper(c_name) AS name_upper,
       length(c_name) AS name_len,
       substring(c_name, 1, 8) AS name_prefix,
       replace(c_name, 'Customer', 'Client') AS renamed,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
       levenshtein(c_mktsegment, 'BUILDING') AS seg_distance,
       round(abs(c_acctbal), 2) AS abs_balance
FROM customer
""",
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth (SURVEY §2.6 'absent' rows): string
    manipulation, padding, edit distance, abs/round — all JVM built-ins
    with exact DuckDB twins."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("client_id"),
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.expr("replace(c_name, 'Customer', 'Client')").alias("renamed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_key"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "seg_distance"
        ),
        F.round(F.abs("c_acctbal"), 2).alias("abs_balance"),
    )


@register(
    "asof_last_purchase",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'),
 purchases AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value AS pval
  FROM events WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, c.ts,
       p.pts AS pts_asof, p.pval AS pval_asof
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.pts
""",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for every click, the user's most
    recent purchase at-or-before it. Spark has no ASOF JOIN; the union +
    running-window formulation does it in ONE key shuffle. The oracle is
    DuckDB's NATIVE ASOF LEFT JOIN — two independent implementations of
    the semantics."""
    from migrate_cassandra_to_mysql_spark.operators.asof import asof_join

    e = T(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pval")
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="pts",
        value_cols=["pts", "pval"], suffix="_asof",
    )


@register(
    "range_join_attribution",
    oracle="""
WITH signups AS (
  SELECT event_id AS signup_id, CAST(ts AS TIMESTAMP) AS sts
  FROM events WHERE event_type = 'signup'),
 clicks AS (
  SELECT event_id AS click_id, user_id AS click_user,
         CAST(ts AS TIMESTAMP) AS cts
  FROM events WHERE event_type = 'click')
SELECT s.signup_id, c.click_id, c.click_user
FROM signups s JOIN clicks c
  ON epoch(c.cts) >= epoch(s.sts) AND epoch(c.cts) < epoch(s.sts) + 300
""",
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range (interval) join with NO equi key: every click within 5
    minutes after any signup. The oracle is the plain theta join; the
    Spark plan (operators/rangejoin.py) buckets time into 5-minute cells
    so it runs as an equi-join on cell id + refine — O(matches), not
    O(N*M) nested loops."""
    from migrate_cassandra_to_mysql_spark.operators.rangejoin import time_range_join

    e = T(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("sts")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("cts"),
    )
    return time_range_join(signups, clicks, "sts", "cts", 300).select(
        "signup_id", "click_id", "click_user"
    )


@register(
    "events_sessionize",
    oracle="""
WITH d AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch(CAST(ts AS TIMESTAMP))
           - lag(epoch(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
)
SELECT user_id, event_id, ts,
       CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM d
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch twin of the streaming session-window operator."""
    e = T(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(order)
    d = e.select("user_id", "event_id", "ts", gap.alias("gap_s"))
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(
            F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0)
        )
        .over(running)
        .cast("long")
        .alias("session_id"),
    )


@register(
    "events_session_window_native",
    oracle="""
WITH d AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         epoch(CAST(ts AS TIMESTAMP))
           - lag(epoch(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id ORDER BY ts) AS gap_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN gap_s IS NULL OR gap_s >= 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session aggregation via Spark's NATIVE session_window
    (dynamic-gap session merge inside one hash aggregation) — the
    Catalyst-built twin of events_sessionize's lag+cumsum construction
    and of the streaming sessionizer. Semantics pinned by the oracle: a
    gap of exactly the 30-min threshold STARTS a new session (native
    merges only while the next event is strictly before session end), so
    the cumsum twin uses >=, unlike events_sessionize's > contract.

    Scale shape: ONE shuffle on user_id; Spark merges overlapping
    per-event candidate windows map-side inside the session-window
    aggregation (no per-user window sort pass, no second shuffle) — and
    the identical groupBy runs under readStream with a watermark, where
    the lag+cumsum form is inexpressible."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("win"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "snapshot_cdc_diff",
    oracle="""
WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
 upd AS (SELECT o_orderkey,
                CASE WHEN o_orderkey % 501 = 0 THEN o_totalprice + 1
                     ELSE o_totalprice END AS o_totalprice,
                o_orderstatus
         FROM o WHERE o_orderkey % 997 <> 0),
 ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
                o_orderstatus
         FROM o WHERE o_orderkey % 1009 = 0),
 n AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS order_key,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       CAST(o.o_totalprice AS DOUBLE) AS old_price,
       o.o_orderstatus AS old_status,
       CAST(n.o_totalprice AS DOUBLE) AS new_price,
       n.o_orderstatus AS new_status
FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice <> n.o_totalprice
   OR o.o_orderstatus <> n.o_orderstatus
""",
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-snapshot delta (CDC shape): diff two keyed snapshots
    into insert/delete/update rows via operators/reconcile.snapshot_diff
    — ONE co-partitioned full-outer join, column-wise null-safe compare,
    no row hashing, no driver materialization. The "new" snapshot is
    simulated deterministically from orders (deletes: key % 997, updates:
    +1 price on key % 501, inserts: cloned keys offset by 1e8), so both
    engines construct the identical pair of snapshots. This is the re-run
    path the reference's one-shot migration lacks: second and later runs
    write only the delta through the idempotent sink."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    upd = o.where(F.col("o_orderkey") % 997 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 501 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    ins = o.where(F.col("o_orderkey") % 1009 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    new = upd.unionByName(ins)
    d = snapshot_diff(
        o, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return d.select(
        F.col("o_orderkey").alias("order_key"),
        "change_type",
        F.col("old_o_totalprice").cast("double").alias("old_price"),
        F.col("old_o_orderstatus").alias("old_status"),
        F.col("new_o_totalprice").cast("double").alias("new_price"),
        F.col("new_o_orderstatus").alias("new_status"),
    )


# EWMA constants. Decay 0.75 is DYADIC-EXACT: 0.75^i and every partial
# weight sum fit a 53-bit mantissa exactly for i <= 15, so the weight
# literals below (emitted via repr -> shortest-roundtrip text) parse to
# bit-identical doubles in Spark and DuckDB, and the whole per-row
# expression — a FIXED left-associated chain, not an aggregation — is
# IEEE-identical cross-engine with no DECIMAL detour and no pow()
# (whose libm may differ between engines).
_EWMA_DECAY = 0.75
_EWMA_DEPTH = 16
_EWMA_W = [_EWMA_DECAY**i for i in range(_EWMA_DEPTH)]
_EWMA_CW = [sum(_EWMA_W[: n + 1]) for n in range(_EWMA_DEPTH)]


def _ewma_expr_sql() -> str:
    """round(num / den, 8) over columns v0..v15 and rn — shared verbatim
    by the Spark plan and the DuckDB oracle."""
    num = " + ".join(
        f"coalesce(v{i}, 0.0) * {_EWMA_W[i]!r}"
        for i in range(_EWMA_DEPTH)
    )
    den_cases = " ".join(
        f"WHEN {n + 1} THEN {_EWMA_CW[n]!r}"
        for n in range(_EWMA_DEPTH - 1)
    )
    den = (
        f"CASE (CASE WHEN rn < {_EWMA_DEPTH} THEN rn"
        f" ELSE {_EWMA_DEPTH} END) {den_cases}"
        f" ELSE {_EWMA_CW[_EWMA_DEPTH - 1]!r} END"
    )
    return f"round(({num}) / ({den}), 8)"


def _ewma_oracle() -> str:
    lags = ",\n           ".join(
        f"lag(value, {i}) OVER w AS v{i}" for i in range(1, _EWMA_DEPTH)
    )
    return f"""
WITH x AS (SELECT user_id, event_id,
           value AS v0,
           row_number() OVER w AS rn,
           {lags}
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
SELECT user_id, event_id, {_ewma_expr_sql()} AS ewma
FROM x
"""


@register("events_ewma_smoothing", oracle=_ewma_oracle())
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the event value per
    user over event order (depth-16 window, decay 0.75, weights
    renormalized over the rows actually present so early events aren't
    biased toward zero) — the exponential-decay feature beside the
    uniform rolling mean (events_sliding_windows / moving_order_spend):
    recency-weighted user activity is the standard online-feature shape.

    Scale shape: ONE hash exchange on user_id feeds a single Window
    node computing all 15 lags + row_number in the same pass (one sort,
    no per-lag shuffles); the EWMA itself is a per-row codegen
    expression chain. The depth cap (16) is the state bound: memory per
    window frame is O(depth) regardless of a user's event count, and
    truncating 0.75^16 < 1% weight is the documented approximation.
    Determinism: dyadic-exact weight literals + fixed association make
    the arithmetic bit-identical cross-engine (see _EWMA_DECAY note).
    """
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    x = ev.select(
        "user_id",
        "event_id",
        F.col("value").alias("v0"),
        F.row_number().over(w).alias("rn"),
        *[
            F.lag("value", i).over(w).alias(f"v{i}")
            for i in range(1, _EWMA_DEPTH)
        ],
    )
    return x.select(
        "user_id", "event_id", F.expr(_ewma_expr_sql()).alias("ewma")
    )
