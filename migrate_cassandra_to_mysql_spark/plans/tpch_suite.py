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
    "q2_min_cost_supplier",
    oracle="""
WITH sp AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
 eur AS (
  SELECT pk, sk, cost, s_name, n_name
  FROM sp JOIN supplier ON s_suppkey = sk
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'),
 best AS (SELECT pk, min(cost) AS mc FROM eur GROUP BY pk)
SELECT p_partkey AS part_key, p_name AS part_name, sk AS supp_key,
       s_name AS supp_name, n_name AS nation_name,
       CAST(cost AS DOUBLE) AS min_cost
FROM eur JOIN best USING (pk) JOIN part ON p_partkey = pk
WHERE cost = mc AND p_size <= 15 AND p_type = 'STANDARD'
ORDER BY part_key, supp_key
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (minimum-cost supplier; no partsupp table in the
    testdata, so lineitem's (partkey, suppkey) pairs ARE the part-supplier
    relation and min extendedprice stands in for ps_supplycost): the
    correlated `cost = (SELECT min(cost) ... WHERE region)` subquery,
    decorrelated into a per-part min + equality join back. The per-(part,
    supplier) cost relation is ~|part|x|supp-per-part| — far smaller than
    lineitem — so both the min-agg and the join-back shuffle on pk are
    cheap; supplier/nation/region collapse to one broadcast map. All-ties
    kept (TPC-H semantics); exact-decimal min so boundary equality is
    cross-engine stable."""
    li = T(spark, sf_dir, "lineitem")
    sp = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.expr("min(CAST(l_extendedprice AS DECIMAL(18,2)))").alias("cost"))
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    eur = sp.join(F.broadcast(s), sp["sk"] == s["s_suppkey"]).select(
        "pk", "sk", "cost", "s_name", "n_name"
    )
    best = eur.groupBy("pk").agg(F.min("cost").alias("mc"))
    p = (
        T(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    return (
        eur.join(best, "pk")
        .where(F.col("cost") == F.col("mc"))
        .join(F.broadcast(p), F.col("pk") == p["p_partkey"])
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("sk").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            F.col("cost").cast("double").alias("min_cost"),
        )
        .orderBy("part_key", "supp_key")
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, sn.n_name AS supp_nation,
         {_REVENUE} AS rev
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
SELECT yr,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
       CAST(sum(rev) AS DOUBLE) AS total_volume,
       count(*) AS n_items
FROM vol GROUP BY yr ORDER BY yr
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of AMERICA-market
    ECONOMY-part revenue per order year. The five dimension joins (customer
    +nation+region, supplier+nation, part) all broadcast; lineitem->orders
    is the single big shuffle join. Numerator and denominator are exact
    decimal sums folded into ONE aggregation pass (conditional CASE sum);
    the division happens once per year-group in double, then rounds."""
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    c = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    s = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = T(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )
    nation_rev = F.expr(
        f"sum(CASE WHEN supp_nation = 'NATION_3' THEN {_REVENUE}"
        " ELSE CAST(0 AS DECIMAL(18,2)) END)"
    )
    total_rev = F.expr(f"sum({_REVENUE})")
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.round(
                nation_rev.cast("double") / total_rev.cast("double"), 6
            ).alias("mkt_share"),
            total_rev.cast("double").alias("total_volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("yr")
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
SELECT n_name AS nation_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(sum({_REVENUE}
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation_name, yr
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-type profit; ps_supplycost doesn't exist, so
    cost is modeled as 10% of p_retailprice per unit): profit per supplier
    nation per order year over a part-name LIKE filter. The LIKE pushes to
    the part scan, part broadcasts, and the per-row profit expression is
    pure exact-decimal arithmetic — identical bits in both engines — summed
    in one partial+final agg. lineitem->orders stays the only shuffle."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        T(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = T(spark, sf_dir, "nation")
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", "n_name")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
    )
    profit = F.expr(
        f"sum({_REVENUE} - CAST(p_retailprice AS DECIMAL(18,2))"
        " * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(3,2)))"
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(profit.cast("double").alias("profit"))
        .orderBy("nation_name", "yr")
    )


@register(
    "q11_important_parts",
    oracle="""
WITH val AS (
  SELECT l_partkey AS part_key,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_regionkey = 2
  GROUP BY l_partkey),
 tot AS (SELECT sum(v) AS t, count(*) AS n FROM val)
SELECT part_key, CAST(v AS DOUBLE) AS part_value
FROM val, tot
WHERE CAST(v AS DOUBLE) * n > CAST(t AS DOUBLE) * 2
ORDER BY part_value DESC, part_key
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock identification): parts whose
    ASIA-supplied value exceeds 2x the average part value — the global-sum
    scalar subquery (`HAVING value > fraction * sum(...)`) shape. The
    per-part value relation is aggregated once; the global (sum, count)
    scalar is a 1-row broadcast crossJoin, NOT a second scan. Threshold
    compares double-cast exact decimals with an integer multiplier — no
    decimal-precision clamping on either engine, identical boundary
    behavior. A fixed fraction would shrink the result as |part| grows;
    the relative-to-average form is scale-stable."""
    li = T(spark, sf_dir, "lineitem")
    n = T(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)))").alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("n"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(
            F.col("v").cast("double") * F.col("n")
            > F.col("t").cast("double") * 2
        )
        .select("part_key", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("part_key"))
    )


@register(
    "q16_supplier_relation_count",
    oracle="""
SELECT p_brand AS brand, p_type AS ptype, p_size AS psize,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, brand, ptype, psize
""",
)
def q16_supplier_relation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (parts/supplier relationship; lineitem is the
    part-supplier relation): distinct-supplier counts per part attribute
    triple, excluding a supplier denylist (NOT IN subquery -> LEFT ANTI
    against the low-balance suppliers; keys are non-NULL so the NOT IN /
    anti-join equivalence is exact). count(DISTINCT) expands to Spark's
    two-phase distinct-agg — partial dedup map-side before the shuffle."""
    p = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "ptype", "psize")
    )


@register(
    "q20_excess_inventory_suppliers",
    oracle="""
SELECT s_suppkey AS supp_key, s_name AS supp_name, n_name AS nation_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 30)
ORDER BY supp_key
""",
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (potential part promotion): suppliers who moved >30
    units of any 'small%' part in 1997 — two nested IN subqueries become a
    broadcast semi-join (part name filter) feeding a grouped HAVING, whose
    survivor keys semi-join back into supplier. Quantity sums are exact
    decimals so the HAVING boundary is cross-engine stable. The inner agg
    shuffles lineitem by (suppkey, partkey) AFTER the part filter cut it
    down; supplier-side join is a broadcast of the distinct survivor keys."""
    parts = (
        T(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").alias("q"))
        .where(F.col("q") > 30)
        .select("l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(movers), s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
        )
        .orderBy("supp_key")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_suppkey AS supp_key, s_name AS supp_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, supp_key
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting; late = shipped
    >90 days after order date since commit/receipt dates don't exist):
    finalized orders where exactly one supplier shipped late. The EXISTS /
    NOT EXISTS pair over inequality self-joins becomes LEFT SEMI (another
    supplier participated) + LEFT ANTI (no OTHER supplier was late) on
    orderkey with a suppkey<> residual. All three legs hash-shuffle on
    l_orderkey, so Spark reuses one exchange; supplier broadcast at the
    end. The late-items leg is computed once and reused for both l1 and
    l3 (self-referential decorrelation)."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderstatus")
    )
    l1 = late.where(F.col("o_orderstatus") == "F").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    kept = l1.join(
        others,
        (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
        "left_anti",
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        kept.join(F.broadcast(s), kept["sk"] == s["s_suppkey"])
        .groupBy(
            F.col("s_suppkey").alias("supp_key"), F.col("s_name").alias("supp_name")
        )
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supp_key"))
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


def _tpch_scalar_suite_oracle() -> str:
    from migrate_cassandra_to_mysql_spark.plans.registry import CATALOG

    q6 = CATALOG["q6_forecast_revenue"].oracle
    q14 = CATALOG["q14_promo_revenue_ratio"].oracle
    q17 = CATALOG["q17_small_quantity_revenue"].oracle
    q19 = CATALOG["q19_disjunctive_revenue"].oracle
    return f"""
SELECT t6.promo_revenue AS q6_revenue, t6.n_items AS q6_n_items,
       t14.promo_pct AS q14_promo_pct, t14.n_items AS q14_n_items,
       t17.small_qty_revenue AS q17_revenue, t17.n_items AS q17_n_items,
       t19.revenue AS q19_revenue, t19.n_items AS q19_n_items
FROM ({q6}) t6
CROSS JOIN ({q14}) t14
CROSS JOIN ({q17}) t17
CROSS JOIN ({q19}) t19
"""


@register("tpch_scalar_suite", oracle=_tpch_scalar_suite_oracle())
def tpch_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four single-row TPC-H aggregates (Q6 scan-filter-agg, Q14
    conditional ratio, Q17 decorrelated AVG subquery, Q19 disjunctive
    predicates) cross-joined into one verification row — four distinct
    optimizer shapes driver-verified through one catalog slot. Each
    component runs its own plan (the cross joins are 1-row frames)."""
    t6 = q6_forecast_revenue(spark, sf_dir).select(
        F.col("promo_revenue").alias("q6_revenue"),
        F.col("n_items").alias("q6_n_items"),
    )
    t14 = q14_promo_revenue_ratio(spark, sf_dir).select(
        F.col("promo_pct").alias("q14_promo_pct"),
        F.col("n_items").alias("q14_n_items"),
    )
    t17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.col("small_qty_revenue").alias("q17_revenue"),
        F.col("n_items").alias("q17_n_items"),
    )
    t19 = q19_disjunctive_revenue(spark, sf_dir).select(
        F.col("revenue").alias("q19_revenue"),
        F.col("n_items").alias("q19_n_items"),
    )
    return t6.crossJoin(t14).crossJoin(t17).crossJoin(t19)
