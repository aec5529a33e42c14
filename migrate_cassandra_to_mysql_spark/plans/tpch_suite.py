"""TPC-H-style decision-support breadth suite (adapted to the driver testdata
schema, FIXTURES.md §B — no partsupp/commitdate/shipmode columns, so each
query is the closest analog expressible over the available columns).

The reference (/root/reference) has no analytical queries at all (SURVEY §2.4
"absent" rows); this suite is the general OLAP surface a complete engine must
expose. Every query follows the registry determinism rules: exact DECIMAL
money sums cast to DOUBLE only at the edge, BIGINT counts, full ORDER BY
tie-breaks, identical column aliases on both engines.

Scale notes (100 TB stance) are in each docstring: which side broadcasts,
which shuffles, where the partial aggregation happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "q4_priority_late_ship",
    oracle="""
SELECT o_orderpriority AS priority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order-priority checking): orders in a window having
    at least one lineitem shipped >60 days after the order date (EXISTS
    correlated subquery -> LEFT SEMI join; the reference's existence probe
    P6 done set-at-a-time). lineitem never materializes past the semi join;
    the agg is 5 groups, all partial map-side."""
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sem.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate.
    All three predicates push to the parquet scan (PushedFilters), the sum
    is a single partial+final agg — the shape where columnar pruning +
    pushdown do all the work; zero joins, one 1-row shuffle."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum({_REVENUE}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog (volume shipping between two nations): two aliased
    uses of the nation dim, disjunctive cross-nation predicate, year
    extraction. supplier+nation and customer+nation collapse to two
    broadcast maps; lineitem->orders is the only big join. At 100 TB the
    orders side is pre-filtered by nothing, so this is a shuffle join on
    orderkey — bucketing both tables on orderkey (tests/test_bucketing)
    removes that exchange."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = T(spark, sf_dir, "nation")
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("volume"))


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey AS cust_key, c_name AS cust_name,
       CAST(sum({_REVENUE}) AS DOUBLE) AS revenue,
       any_value(c_acctbal) AS acct_bal, any_value(n_name) AS nation_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, cust_key
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue in a half-year. returnflag+date filters cut lineitem and
    orders before the join; customer/nation broadcast; deterministic top-20
    via TakeOrderedAndProject."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    j = (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name")
        )
        .agg(
            F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("revenue"),
            F.any_value(F.col("c_acctbal")).alias("acct_bal"),
            F.any_value(F.col("n_name")).alias("nation_name"),
        )
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
        .limit(20)
    )


@register(
    "q12_priority_case_sum",
    oracle="""
SELECT l_linestatus AS line_status,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_priority_case_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (shipping-priority split; l_shipmode doesn't exist
    in the testdata so l_linestatus is the grouping axis): conditional
    CASE-sum aggregation over a join — the pivot-style agg shape. Both
    case-sums fold into one partial agg pass."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join with
    an extra join predicate (not a post-filter — NULL-extension semantics
    differ!), then double aggregation. First agg shuffles by custkey, the
    second by the tiny c_count domain."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REVENUE}) AS DOUBLE), 6) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
""",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue ratio. Both sums
    are exact decimals (bit-identical across engines); the division happens
    once, in double, then rounds — so the ratio is reproducible. part is
    broadcast; lineitem is pre-filtered by the scan-pushed date range."""
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    promo = F.expr(
        f"sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE}"
        " ELSE CAST(0 AS DECIMAL(18,2)) END)"
    )
    total = F.expr(f"sum({_REVENUE})")
    return j.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supp_key, sum({_REVENUE}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT supp_key, s_name AS supp_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = supp_key
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY supp_key
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue-per-supplier CTE reused twice —
    once as the ranking base, once inside the scalar MAX subquery. Spark
    form: window MAX over the aggregated (small) per-supplier relation, so
    the corpus is scanned once; comparison happens on the exact decimal,
    not the rounded double."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supp_key")).agg(
        F.expr(f"sum({_REVENUE})").alias("total_rev")
    )
    # Scalar MAX as a 1-row broadcast instead of an unpartitioned window —
    # avoids funneling the per-supplier relation through a single partition.
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).where(
        F.col("total_rev") == F.col("max_rev")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(s), top["supp_key"] == s["s_suppkey"])
        .select(
            "supp_key",
            F.col("s_name").alias("supp_name"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("supp_key")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pstats AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS n_li
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_items
FROM lineitem JOIN pstats ON l_partkey = pk
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity-order revenue): lineitems whose
    quantity is below 20% of the part's average — the correlated AVG
    subquery decorrelated into a groupBy + self-join. The predicate is
    exact-integer arithmetic (qty*5*n < sum) instead of a float AVG
    comparison, so both engines agree on boundary rows. At scale the
    per-part stats relation is ~|part| rows — tiny next to lineitem — and
    broadcast."""
    li = T(spark, sf_dir, "lineitem")
    pstats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12").select("p_partkey")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(pstats), li["l_partkey"] == pstats["pk"])
        .where(
            F.expr("CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li") < F.col("sum_qty")
        )
    )
    return j.agg(
        F.expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "small_qty_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c_custkey AS cust_key, o_orderkey AS order_key,
       o_orderdate AS order_date, o_totalprice AS total_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 170)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY total_price DESC, order_key
LIMIT 25
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN + HAVING subquery becomes a
    pre-aggregated key set LEFT SEMI-joined into the main path. The heavy
    relation aggregates once per orderkey for the filter and once for the
    output — Spark reuses the first agg's shuffle for the semi join because
    both hash by l_orderkey."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").alias("q"))
        .where(F.col("q") > 170)
        .select("l_orderkey")
    )
    o = T(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey")
    j = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
        )
        .agg(
            F.expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").alias(
                "sum_qty"
            )
        )
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(25)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(sum({_REVENUE}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    brand/size/quantity conjuncts OR-ed across the join. Catalyst extracts
    the common join key and pushes the brand/size disjunction to the part
    scan; the residual mixed predicate evaluates post-join in codegen."""
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = T(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 40))
    )
    return j.where(cond).agg(
        F.expr(f"CAST(sum({_REVENUE}) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH avg_bal AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey AS nation_key, count(*) AS n_cust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (global sales opportunity): above-average-balance
    customers with no recent orders. The scalar AVG subquery is computed as
    exact decimal sum/count (cross-engine reproducible) and cross-joined as
    a 1-row broadcast; NOT EXISTS becomes LEFT ANTI against date-filtered
    orders — the reference's missing-key reconciliation (J1) shape at
    engine scale."""
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.expr("CAST(c_acctbal AS DECIMAL(18,2))").alias("bal")
    )
    avg_bal = (
        c.where(F.col("bal") > 0)
        .agg((F.sum("bal") / F.count(F.lit(1))).alias("ab"))
    )
    recent = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    kept = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("bal") > F.col("ab"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
    )
    return kept.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("bal").cast("double").alias("total_bal"),
    )
