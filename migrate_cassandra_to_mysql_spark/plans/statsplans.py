"""Statistics / profiling query catalog — the data-profiling surface a
100 TB pipeline needs (distribution stats, histograms, samples, corpus
frequencies). The reference has no stats beyond count(*); these are the
general forms (SURVEY §2.4/2.5 'absent' rows) plus training-data profiling.

Determinism notes:
  - Variance/stddev are computed from exact decimal sums (sum, sum of
    squares) instead of streaming moment aggregates — Welford vs two-pass
    accumulation would differ across engines at the ulp level; exact sums
    make the final double bit-identical.
  - Percentiles use linear interpolation (Spark `percentile` == DuckDB
    `quantile_cont`), rounded to 6 dp.
  - Sampling is hash-based (md5 bucket), not Bernoulli — reproducible
    everywhere, and at scale it pushes down as a cheap filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.hashing import (
    md5_token_bucket,
    oracle_bucket_sql,
)
from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


@register(
    "order_price_stats",
    oracle="""
WITH s AS (
  SELECT o_orderstatus AS status,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq,
         CAST(min(o_totalprice) AS DOUBLE) AS min_price,
         CAST(max(o_totalprice) AS DOUBLE) AS max_price,
         round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
         round(quantile_cont(o_totalprice, 0.95), 6) AS p95
  FROM orders GROUP BY o_orderstatus)
SELECT status, n, sum_price, min_price, max_price, p50, p95,
       sum_price / n AS avg_price,
       round((sum_sq - sum_price * sum_price / n) / n, 4) AS var_pop
FROM s
""",
)
def order_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profile per status: count/sum/min/max/median/p95/avg/
    variance. Variance from exact decimal sums (see module docstring)."""
    o = T(spark, sf_dir, "orders")
    s = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "sum_price"
        ),
        F.expr(
            "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))"
            " * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sum_sq"),
        F.expr("CAST(min(o_totalprice) AS DOUBLE)").alias("min_price"),
        F.expr("CAST(max(o_totalprice) AS DOUBLE)").alias("max_price"),
        F.expr("round(percentile(o_totalprice, 0.5), 6)").alias("p50"),
        F.expr("round(percentile(o_totalprice, 0.95), 6)").alias("p95"),
    )
    return s.select(
        "status", "n", "sum_price", "min_price", "max_price", "p50", "p95",
        (F.col("sum_price") / F.col("n")).alias("avg_price"),
        F.round(
            (F.col("sum_sq") - F.col("sum_price") * F.col("sum_price") / F.col("n"))
            / F.col("n"),
            4,
        ).alias("var_pop"),
    )


@register(
    "price_histogram",
    oracle="""
SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT) + 1, 13) AS bucket,
       count(*) AS n_orders,
       CAST(min(o_totalprice) AS DOUBLE) AS bucket_min,
       CAST(max(o_totalprice) AS DOUBLE) AS bucket_max
FROM orders GROUP BY 1
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (12 x 50k buckets, overflow clamped to 13) —
    single map-side pass plus a 13-row shuffle. Explicit width_bucket
    arithmetic because DuckDB 1.0 lacks the builtin."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr(
            "least(CAST(floor(o_totalprice / 50000) AS BIGINT) + 1, 13)"
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(min(o_totalprice) AS DOUBLE)").alias("bucket_min"),
        F.expr("CAST(max(o_totalprice) AS DOUBLE)").alias("bucket_max"),
    )


@register(
    "events_cube",
    oracle="""
SELECT event_type, user_id % 10 AS user_mod,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, user_id % 10)
""",
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE (all 4 grouping-set combinations) over type x user bucket."""
    e = T(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_mod"), "value"
    )
    return e.cube("event_type", "user_mod").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
    )


@register(
    "deterministic_sample",
    oracle=f"""
SELECT l_orderkey AS order_key, l_linenumber AS line_number,
       l_quantity AS quantity
FROM lineitem
WHERE {oracle_bucket_sql('l_orderkey')} < 8
""",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~3% reproducible sample via hash bucket < 8/256 — unlike Bernoulli
    sampling this is stable across engines, retries, and reruns, and whole
    orders stay together (sampling unit = key, not row)."""
    li = T(spark, sf_dir, "lineitem")
    return li.where(md5_token_bucket(F.col("l_orderkey")) < 8).select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").alias("quantity"),
    )


_WS_K = 100  # fixed sample budget
# 16^12: md5's first 12 hex digits as a uniform in (0, 1] (the +1 keeps
# u > 0 so ln(u) is finite)
_WS_DENOM = 281474976710656.0


@register(
    "weighted_sample_topk",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars + 1 AS DOUBLE) AS wt,
         ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           + 1) / CAST({_WS_DENOM} AS DOUBLE)) AS u
  FROM documents),
 keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         round(-ln(u) / wt, 10) AS es_key
  FROM w)
SELECT doc_id, lang, n_chars, es_key, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (ORDER BY es_key, doc_id) AS rnk
      FROM keyed) t
WHERE rnk <= {_WS_K}
""",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement at a fixed budget
    (Efraimidis & Spirakis 2006 A-ES): keep exactly k documents with
    inclusion probability proportional to a weight — here doc size
    (n_chars + 1), the 'sample the training subset ∝ quality/length'
    curation op. Each row draws a reproducible uniform u from md5 of
    its key (the engine's shared-hash discipline) and ranks by the
    exponential clock e = -ln(u)/w: the k SMALLEST clocks are exactly
    an A-ES weighted sample. The fixed-RATE twins (deterministic_sample
    / stratified_sample / temperature_mix_sample) keep a hash-threshold
    share; this keeps an exact COUNT under weights — the form a fixed
    token budget needs.

    Scale shape: the key is one map-side expression chain (md5 → conv →
    ln — all codegen, no UDF, no rand() state); the corpus-sized step is
    orderBy().limit(k), which compiles to TakeOrderedAndProject (per-
    partition k-heaps, no global sort), so the sample never shuffles the
    corpus and is reproducible across engines, retries, and
    partitionings. The rnk column is assigned AFTER the top-k, by a
    window over the <=k surviving rows (bounded-by-k, the hybrid-RRF
    discipline) — never a global window over the corpus. The clock is
    rounded to 10 dp before ranking (the ln-ulp discipline, see
    _bm25_score_sql) with doc_id as the total tie-break."""
    d = T(spark, sf_dir, "documents")
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
         .cast("double") + F.lit(1.0))
        / F.lit(_WS_DENOM)
    )
    wt = (F.col("n_chars") + F.lit(1)).cast("double")
    keyed = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(-F.log(u) / wt, 10).alias("es_key"),
    )
    from pyspark.sql import Window

    topk = keyed.orderBy(F.asc("es_key"), F.asc("doc_id")).limit(_WS_K)
    w = Window.orderBy(F.asc("es_key"), F.asc("doc_id"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long"))


_CMS_D = 4  # hash rows
_CMS_W = 1024  # buckets per row
# heavy-hitter cut: estimated count >= total_tokens / 200 (>=0.5%)
_CMS_FRAC = 200


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL),
 r AS (SELECT unnest([0, 1, 2, 3]) AS r),
 hashed AS (
  SELECT tok.tok, r.r,
         (('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':' || tok.tok),
                             1, 8))::BIGINT) % {_CMS_W} AS bucket
  FROM tok, r),
 cells AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY 1, 2),
 truth AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM tok GROUP BY 1),
 total AS (SELECT CAST(sum(true_cnt) AS BIGINT) AS n FROM truth),
 probes AS (
  SELECT t.tok, t.true_cnt, r.r,
         (('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':' || t.tok),
                             1, 8))::BIGINT) % {_CMS_W} AS bucket
  FROM truth t, r),
 est AS (
  SELECT p.tok, CAST(max(p.true_cnt) AS BIGINT) AS true_cnt,
         CAST(min(c.c) AS BIGINT) AS est
  FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
  GROUP BY p.tok)
SELECT e.tok, e.true_cnt, e.est
FROM est e, total
WHERE e.est >= total.n // {_CMS_FRAC}
ORDER BY e.est DESC, e.tok
""",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    token frequencies estimated from a d=4 x w=1024 sketch — BOUNDED
    memory no matter the vocabulary (the 100 TB point: an exact
    token-count table scales with distinct tokens; the sketch is 4096
    cells regardless), one-sided error (est >= truth, over-count <=
    eN/w with probability 1-(1/2)^d). Hashes derive from md5 (the
    engine's shared-hash discipline — no seeds, identical cells on
    every engine/retry/partitioning). Returns tokens whose ESTIMATE
    crosses 0.5% of total volume, with the exact count alongside so
    the driver row also pins the one-sided-error contract row by row.

    Scale shape: token explode -> ONE partial-agg shuffle into the
    4096-cell sketch (map-side combine makes the exchange carry at
    most cells x partitions rows); the probe side reuses the exact
    per-token agg (vocabulary-sized) and joins the sketch BROADCAST
    (4096 rows); the final min-over-rows is a vocabulary-keyed partial
    agg. In production the exact `truth` column drops and candidates
    stream against the broadcast sketch — the sketch build itself is
    the bounded-state pass either way."""
    d = T(spark, sf_dir, "documents")
    tok = d.where(F.col("text").isNotNull()).select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("r"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("r").cast("string"), F.col("tok"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    # ONE fact pass (r15, guide §1.2/§2.4): this row must also emit the
    # EXACT per-token counts (the one-sided-error contract columns), so
    # the vocabulary-sized `truth` frame is computed regardless — and a
    # sketch cell is a pure function of it: c(r, b) = sum of true
    # counts over tokens hashing to (r, b), exactly the row count the
    # old token-level pass aggregated (identical integers, unchanged
    # oracle). Building cells FROM truth removes the second corpus
    # explode and its 4x-fact-scale md5 stage — the d hash evaluations
    # now run per VOCAB entry, not per token occurrence. (A production
    # sketch build without the exactness contract streams occurrences
    # into the 4096 cells directly — that bounded-state pass is what
    # the operator documents; this row's exactness columns are why the
    # vocab table exists here at all.) truth is checkpointed once:
    # cells/total/probes all reference it, and un-materialized each
    # branch would re-run the corpus explode + vocab aggregation.
    truth = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .localCheckpoint(eager=True)
    )
    cells = (
        truth.crossJoin(F.broadcast(rows))
        .select("r", bucket.alias("bucket"), "true_cnt")
        .groupBy("r", "bucket")
        .agg(F.sum("true_cnt").cast("long").alias("c"))
    )
    total = truth.agg(F.sum("true_cnt").cast("long").alias("n"))
    probes = truth.crossJoin(F.broadcast(rows)).select(
        "tok", "true_cnt", "r", bucket.alias("bucket")
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("tok")
        .agg(
            F.max("true_cnt").cast("long").alias("true_cnt"),
            F.min("c").cast("long").alias("est"),
        )
    )
    return (
        est.join(F.broadcast(total))
        .where(F.col("est") >= F.expr(f"n DIV {_CMS_FRAC}"))
        .select("tok", "true_cnt", "est")
        .orderBy(F.desc("est"), F.asc("tok"))
    )


@register(
    "json_struct_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
""",
)
def json_struct_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with from_json (schema-on-read into a struct) —
    the scalable form: one parse per row into columnar struct fields, not
    repeated get_json_object string scans."""
    e = T(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.where(F.col("p.k").isNotNull())
        .select(
            "event_id",
            F.col("p.k").alias("k_value"),
            F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
        )
    )


@register(
    "parts_catalog_profile",
    oracle="""
SELECT p_brand AS brand,
       count(*) AS n_parts,
       count(DISTINCT p_type) AS n_types,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       max(p_size) AS max_size,
       CAST(sum(CASE WHEN s_count > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_supplied_sizes
FROM (
  SELECT p.*, (SELECT count(*) FROM supplier s
               WHERE s.s_nationkey = p.p_size % 25) AS s_count
  FROM part p) t
GROUP BY p_brand
""",
)
def parts_catalog_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-table profiling over part+supplier (correlated-count via
    broadcast join of the 10-row supplier dim — never a per-row subquery
    in Spark)."""
    p = T(spark, sf_dir, "part")
    s_counts = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("s_count"))
    )
    joined = p.join(
        F.broadcast(s_counts), (p["p_size"] % 25) == s_counts["nk"], "left"
    ).withColumn("s_count", F.coalesce("s_count", F.lit(0)))
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        F.expr("CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "sum_price"
        ),
        F.max("p_size").alias("max_size"),
        F.expr("CAST(sum(CASE WHEN s_count > 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_supplied_sizes"
        ),
    )


@register(
    "events_grouping_sets",
    oracle="""
SELECT event_type, user_id % 5 AS user_mod,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
""",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the literal form beyond cube/rollup), run
    through the engine's SQL entry point — the same Catalyst plan surface
    as the DataFrame API."""
    T(spark, sf_dir, "events").createOrReplaceTempView("events_gs_v")
    return spark.sql(
        """
        SELECT event_type, user_id % 5 AS user_mod,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events_gs_v
        GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
        """
    )


_KMV_K = 64
_KMV_SCALE = float((_KMV_K - 1) * (1 << 48))  # (k-1) * 2^48, exact in double


def _kmv_oracle_branch(col: str) -> str:
    return f"""
SELECT '{col}' AS key_name, n_exact,
       round(kmv_est, 4) AS kmv_estimate,
       round((kmv_est - n_exact) / n_exact * 100, 4) AS rel_err_pct
FROM (
  SELECT (SELECT count(*) FROM (
            SELECT DISTINCT CAST('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 12)
                                 AS BIGINT) AS h FROM lineitem) d) AS n_exact,
         (SELECT CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
                      ELSE {_KMV_SCALE!r} / max(h) END
          FROM (SELECT DISTINCT CAST('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 12)
                                     AS BIGINT) AS h
                FROM lineitem ORDER BY h LIMIT {_KMV_K}) t) AS kmv_est) s
"""


@register(
    "approx_distinct_stats",
    oracle=" UNION ALL ".join(
        _kmv_oracle_branch(c) for c in ("l_orderkey", "l_partkey", "l_suppkey")
    ),
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count sketching via KMV (k-minimum-values, k=64): hash each
    key with md5 to a uniform 48-bit space, keep the k smallest distinct
    hashes; estimate = (k-1) * 2^48 / kth_min (exact count when fewer than
    k values). Unlike HLL++ (whose estimates are implementation-specific),
    KMV over a shared hash is bit-reproducible in both engines, so the
    sketch itself is oracle-checked. The native constant-memory HLL++ path
    (approx_count_distinct) keeps its accuracy contract in
    tests/test_approx.py. Scale: the k-smallest pass is a per-partition
    top-k (TakeOrdered) — only k rows per partition reach the driver-side
    merge, and the estimate is O(1) memory at any corpus size. Each
    column's distinct-hash frame feeds BOTH the kth-min and the exact
    count, so it is eagerly checkpointed: un-checkpointed lineage
    re-ran the scan + the distinct shuffle once per reference (6
    lineitem scans; caught by the r12 file_scans baseline feature) —
    the checkpoint write is |distinct| 8-byte rows, strictly cheaper
    than repeating the full distinct exchange."""
    li = T(spark, sf_dir, "lineitem")
    branches = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        h = F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10
        ).cast("long")
        hashes = li.select(h.alias("h")).distinct().localCheckpoint(
            eager=True
        )
        kth = (
            hashes.orderBy("h")
            .limit(_KMV_K)
            .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("m"))
        )
        n_exact = hashes.agg(F.count(F.lit(1)).alias("n_exact"))
        est = F.when(F.col("m") < _KMV_K, F.col("m").cast("double")).otherwise(
            F.lit(_KMV_SCALE) / F.col("kth")
        )
        branches.append(
            kth.crossJoin(n_exact).select(
                F.lit(col).alias("key_name"),
                F.col("n_exact"),
                F.round(est, 4).alias("kmv_estimate"),
                F.round(
                    (est - F.col("n_exact")) / F.col("n_exact") * 100, 4
                ).alias("rel_err_pct"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


@register(
    "top_ngrams",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)
SELECT tok, count(*) AS freq
FROM toks GROUP BY tok
ORDER BY freq DESC, tok
LIMIT 20
""",
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-k — explode -> partial-agg map-side ->
    20-row TakeOrdered. The classic vocabulary/frequency profiling op."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


# Per-group OLS trend fit: shared expression text evaluated over exact
# BIGINT sufficient statistics. num/den are the closed-form normal-
# equation terms; both engines compute them from identical integers, so
# the double divisions are bit-identical — and the outputs FLOOR-
# quantize to whole cents (the kmeans discipline): round(x, 8) at 1e7
# magnitude diverges at the last ulp between the engines' decimal
# rounding implementations (measured 7e-9), while floor of an identical
# double has no tie to disagree on. Whole-cent coefficients lose
# nothing at these magnitudes.
_OLS_SLOPE_SQL = (
    "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"
)
_OLS_INTERCEPT_SQL = (
    "CAST(floor((CAST(sy AS DOUBLE)"
    " - (CAST(n * sxy - sx * sy AS DOUBLE)"
    "    / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE)) AS BIGINT)"
)


def _ols_oracle() -> str:
    return f"""
WITH yr AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) - 1992 AS BIGINT) AS x,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
 s AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y_cents) AS BIGINT) AS sy,
         CAST(sum(x * y_cents) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM yr GROUP BY 1)
SELECT n_name, n AS n_years,
       {_OLS_SLOPE_SQL} AS slope_cents_per_year,
       {_OLS_INTERCEPT_SQL} AS intercept_cents
FROM s WHERE n >= 2
ORDER BY n_name
"""


@register("ols_trend_by_nation", oracle=_ols_oracle())
def ols_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend fit — the regression
    primitive an analytics engine needs beyond corr/covar: for every
    nation, fit revenue_cents = intercept + slope * (order_year - 1992)
    over its yearly order-revenue series via the closed-form normal
    equations (slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²)). This is the
    trend/forecast building block (and the 2-parameter special case of
    the distributed-sufficient-statistics pattern any GLM solver maps
    onto): one pass computes the per-group sufficient statistics, the
    solve is per-group O(1) arithmetic — no iteration, no driver-side
    math.

    Scale shape: TWO aggregations and nothing else — per-(nation, year)
    exact DECIMAL revenue sums (map-side partial agg over the orders
    scan after two dimension equi-joins; customer co-partitions with
    orders on the join key, nation broadcasts), then per-nation BIGINT
    sufficient statistics (25 groups). At 100 TB the fact table is
    touched exactly once; everything downstream of the first groupBy is
    KB-sized.

    Determinism: yearly revenue quantizes to exact BIGINT cents via the
    DECIMAL sum (no float accumulation anywhere); x is a small exact
    integer; the sufficient statistics are exact BIGINTs evaluated into
    slope/intercept through SHARED expression text — one IEEE division
    each, bit-identical cross-engine. Groups with a single year are
    excluded (den = 0)."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") - F.lit(1992))
            .cast("long")
            .alias("x"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("y_cents")
        )
    )
    s = yr.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y_cents").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y_cents")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return (
        s.where(F.col("n") >= 2)
        .select(
            "n_name",
            F.col("n").alias("n_years"),
            F.expr(_OLS_SLOPE_SQL).alias("slope_cents_per_year"),
            F.expr(_OLS_INTERCEPT_SQL).alias("intercept_cents"),
        )
        .orderBy("n_name")
    )


# Grouped MAD outlier fence. The median and the MAD (median absolute
# deviation) are computed EXACTLY over whole-cent BIGINTs via a
# value-HISTOGRAM + cumulative-count window — never a per-group row
# sort: partitioning the window by a 25-value group key over fact rows
# would sort whole-nation partitions (the skew cliff at 100 TB), while
# the histogram is bounded by the price DOMAIN per group, so the sort
# input is KB-sized no matter how many orders exist. Lower-median
# definition (position (n+1) DIV 2, the value whose cumulative count
# first reaches it) — pure integer selection, no averaging, no float
# anywhere until nothing is left to compute. Fence = dev > 2 * MAD
# (o_totalprice is a bounded sum of <= 7 item prices — no heavy tail —
# so the textbook 3x fence is empty by construction at every sf;
# measured: 2x flags ~2.2% of orders, the robust-fence shape worth
# serving).
_MAD_FENCE = 2


def _mad_oracle() -> str:
    return f"""
WITH p AS (
  SELECT n.n_name, o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey),
 h AS (SELECT n_name, cents, CAST(count(*) AS BIGINT) AS c
       FROM p GROUP BY 1, 2),
 hc AS (SELECT n_name, cents, c,
               sum(c) OVER (PARTITION BY n_name ORDER BY cents) AS cum,
               sum(c) OVER (PARTITION BY n_name) AS n
        FROM h),
 med AS (SELECT n_name, cents AS med_cents FROM hc
         WHERE cum >= (n + 1) // 2 AND cum - c < (n + 1) // 2),
 d AS (SELECT p.n_name, p.o_orderkey, p.cents, med.med_cents,
              abs(p.cents - med.med_cents) AS dev_cents
       FROM p JOIN med USING (n_name)),
 dh AS (SELECT n_name, dev_cents, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
 dhc AS (SELECT n_name, dev_cents, c,
                sum(c) OVER (PARTITION BY n_name ORDER BY dev_cents)
                  AS cum,
                sum(c) OVER (PARTITION BY n_name) AS n
         FROM dh),
 mad AS (SELECT n_name, dev_cents AS mad_cents FROM dhc
         WHERE cum >= (n + 1) // 2 AND cum - c < (n + 1) // 2)
SELECT d.n_name, d.o_orderkey, d.cents AS price_cents,
       d.med_cents, mad.mad_cents, d.dev_cents
FROM d JOIN mad USING (n_name)
WHERE d.dev_cents > {_MAD_FENCE} * mad.mad_cents
"""


@register("grouped_mad_outliers", oracle=_mad_oracle())
def grouped_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation robust outlier detection on order value: flag orders
    whose whole-cent price deviates from their nation's EXACT median by
    more than 2x the nation's EXACT median absolute deviation. The
    median/MAD fence is the robust-statistics complement of the
    moment-based corr/covar/OLS rows — a single fat-finger order moves
    a mean and stddev arbitrarily far but moves the median/MAD fence
    not at all (breakdown point 50%), which is why data-quality
    pipelines fence on MAD.

    Scale shape — exact medians WITHOUT per-group row sorts: prices
    quantize to BIGINT cents (the OLS discipline: DECIMAL(18,2) cast,
    no float), each median comes from a value histogram (map-side
    partial groupBy bounded by the price domain per nation) plus a
    cumulative-count window over histogram rows only — the window input
    is domain-sized, not fact-sized, so a 25-group partitionBy never
    sorts a nation's worth of orders. The fact frame is checkpointed
    once and feeds both histogram passes and the final fence; the 25-row
    median/MAD frames broadcast back. At 100 TB the fact table is
    scanned once, shuffled twice (histogram partial-aggs), sorted never.

    Determinism: every value in flight is an exact BIGINT; the
    lower-median is a pure integer position pick ((n+1) DIV 2 over
    cumulative counts — ties impossible, the histogram key is distinct
    per group); the fence comparison is integer. Nothing rounds, no
    float folds.

    The reference computes only COUNT aggregates (reconcile,
    find_missing_ids.py:38-65); engine-added analytics surface."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100))
            .cast("long")
            .alias("cents"),
        )
        .localCheckpoint(eager=True)
    )

    def _hist_median(rows: DataFrame, val: str, out: str) -> DataFrame:
        h = rows.groupBy("n_name", val).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        w_cum = Window.partitionBy("n_name").orderBy(val)
        w_all = Window.partitionBy("n_name")
        return (
            h.withColumn("cum", F.sum("c").over(w_cum))
            .withColumn("n", F.sum("c").over(w_all))
            .withColumn("k", F.expr("(n + 1) DIV 2"))
            .where(
                (F.col("cum") >= F.col("k"))
                & (F.col("cum") - F.col("c") < F.col("k"))
            )
            .select("n_name", F.col(val).alias(out))
        )

    med = _hist_median(p, "cents", "med_cents")
    d = p.join(F.broadcast(med), "n_name").withColumn(
        "dev_cents", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = _hist_median(d, "dev_cents", "mad_cents")
    return (
        d.join(F.broadcast(mad), "n_name")
        .where(F.col("dev_cents") > _MAD_FENCE * F.col("mad_cents"))
        .select(
            "n_name",
            "o_orderkey",
            F.col("cents").alias("price_cents"),
            "med_cents",
            "mad_cents",
            "dev_cents",
        )
    )


# CUSUM level-shift detection (Page 1954): the sequential member of the
# drift-detection family beside grouped_mad_outliers' POINT-outlier
# fence — MAD flags single anomalous values, CUSUM flags SUSTAINED
# departures of the running level from the series mean. Threshold in
# parts-per-million of total revenue so the comparison is exact integer
# arithmetic at every scale.
_CUSUM_THR_PPM = 20000

# |sum_{i<=t}(x_i - S/n)| > thr_frac * S, scaled by n to clear the
# division: |n*P_t - t*S| * 1e6 > THR_PPM * n * S. The n*P/t*S products
# fit BIGINT at every tested scale (n <= ~100 months, P <= S, S <= ~1e14
# cents at the sf5 suite -> n*P <= ~1e16 << 2^63) but the 1e6-scaled
# comparison does not — the flag folds both sides through
# DECIMAL(38,0), exact in both engines; the emitted value stays BIGINT
# so neither engine's client path coerces it to float.
# n*p and t*s fold through DECIMAL(38,0) BEFORE the subtraction (r13
# ADVICE): the raw BIGINT products wrap SILENTLY in non-ANSI Spark
# once cumulative cents push n*p past 2^63 (~sf 50-100) while DuckDB
# raises — a silent cross-engine divergence. In DECIMAL(38,0) the
# products stay exact (verified past 2^53 in both engines) and only
# the final BIGINT output cast bounds the row — loudly on BOTH sides
# (Spark 4's ANSI-default decimal cast raises CAST_OVERFLOW, DuckDB
# raises a conversion error; pinned in tests/test_r14_ops.py). Same
# discipline the flag expression below already used.
_CUSUM_SCALED_SQL = (
    "CAST(CAST(n AS DECIMAL(38,0)) * p - CAST(t AS DECIMAL(38,0)) * s"
    " AS BIGINT)"
)
_CUSUM_FLAG_SQL = (
    "CAST(CASE WHEN abs(CAST(n AS DECIMAL(38,0)) * p"
    "               - CAST(t AS DECIMAL(38,0)) * s) * 1000000"
    f"         > CAST({_CUSUM_THR_PPM} AS DECIMAL(38,0)) * n * s"
    "     THEN 1 ELSE 0 END AS BIGINT)"
)


def _cusum_oracle() -> str:
    return f"""
WITH m AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
           AS ym,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
 w AS (
  SELECT n_name, ym, rev_cents,
         CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n,
         CAST(sum(rev_cents) OVER (PARTITION BY n_name) AS BIGINT) AS s,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY ym)
              AS BIGINT) AS t,
         CAST(sum(rev_cents) OVER (PARTITION BY n_name ORDER BY ym
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS p
  FROM m)
SELECT n_name, ym, rev_cents,
       {_CUSUM_SCALED_SQL} AS cusum_scaled,
       {_CUSUM_FLAG_SQL} AS is_shift
FROM w
ORDER BY n_name, ym
"""


@register("cusum_changepoint", oracle=_cusum_oracle())
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation CUSUM level-shift detection over the monthly order-
    revenue series: for every (nation, month), the cumulative deviation
    of revenue from the nation's series mean, flagged where the running
    |deviation| exceeds _CUSUM_THR_PPM ppm of the nation's total — the
    SEQUENTIAL drift detector (Page 1954) completing the robust-stats
    family: grouped_mad_outliers fences single anomalous points, this
    surfaces sustained regime changes a point fence cannot see (each
    month can be individually unremarkable while the level has moved).

    Scale shape: one orders scan -> two dimension equi-joins (nation
    broadcasts; customer co-partitions on the join key) -> ONE
    map-side-partial aggregation to (nation, month) — the fact table
    collapses to a few-thousand-row series frame before any window
    runs; the four analytic functions share ONE (nation, ym) sort in a
    single Window exchange over KB-sized groups. At 100 TB only the
    first aggregation touches fact-sized data.

    Determinism: monthly revenue quantizes to exact BIGINT cents via
    the DECIMAL sum (the ols_trend discipline); the scaled CUSUM
    n*P_t - t*S == n * sum_{i<=t}(x_i - S/n) clears the mean division
    so every value and the ppm threshold comparison are exact
    DECIMAL(38,0) integer arithmetic — no float anywhere in the row,
    bit-identical under any partitioning."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * F.lit(100) + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("rev_cents")
        )
    )
    grp = Window.partitionBy("n_name")
    ordered = grp.orderBy("ym")
    running = ordered.rowsBetween(Window.unboundedPreceding, 0)
    w = m.select(
        "n_name",
        "ym",
        "rev_cents",
        F.count(F.lit(1)).over(grp).cast("long").alias("n"),
        F.sum("rev_cents").over(grp).cast("long").alias("s"),
        F.row_number().over(ordered).cast("long").alias("t"),
        F.sum("rev_cents").over(running).cast("long").alias("p"),
    )
    return w.select(
        "n_name",
        "ym",
        "rev_cents",
        F.expr(_CUSUM_SCALED_SQL).alias("cusum_scaled"),
        F.expr(_CUSUM_FLAG_SQL).alias("is_shift"),
    ).orderBy("n_name", "ym")


# Theil-Sen robust trend (Theil 1950, Sen 1968): the median of all
# pairwise slopes — breakdown point ~29%, so a corrupted year cannot
# drag the fit the way it drags OLS's squared loss. Slopes are exact
# rationals (integer cent deltas over integer year deltas); both
# engines floor-quantize them to micro-cents/year through the SAME
# pmod identity — floor_div(m, d) = (m - ((m % d) + d) % d) / d with
# d > 0 and (m - r) exactly divisible by d, so the quotient is exact
# under Spark's `div` and DuckDB's `//` alike (no float, no
# truncation-vs-floor divergence on negative slopes).
#
# The micro-scaled products fold through DECIMAL(38,0) on BOTH engines
# (r13 ADVICE): (yb - ya) * 1e6 and y_cents * 1e6 - slope * x overflow
# int64 once per-nation yearly revenue passes ~9.2e12 cents (sf ~50-100
# on the TPC-H generator); raw BIGINT arithmetic wraps SILENTLY in
# non-ANSI Spark while DuckDB raises — a silent divergence. In
# DECIMAL(38,0) the arithmetic stays exact to 1e38 and only the final
# BIGINT output cast bounds the row's applicability, LOUDLY on both
# engines (Spark 4's ANSI-default decimal cast raises CAST_OVERFLOW,
# DuckDB raises a conversion error — tests/test_r14_ops.py pins both,
# plus exactness in the band where the old form wrapped). The slope
# uses the
# split identity floor(dy*1e6/d) = 1e6*floor(dy/d) +
# floor(pmod(dy,d)*1e6/d) so every floor-division runs on BIGINTs
# (DuckDB's // on DECIMALs silently falls back to FLOAT division —
# tested), with the pmod trick keeping floor semantics for negative dy;
# only the overflow-capable multiply/add reassembly is DECIMAL. Both
# expressions are ONE string shared verbatim by the Spark plan and the
# DuckDB oracle ({fd} = div / //, the engines' one syntax split).
_TS_SLOPE_SQL = (
    "CAST("
    "CAST((dy - (((dy % d) + d) % d)) {fd} d AS DECIMAL(38,0)) * 1000000"
    " + ((((dy % d) + d) % d) * 1000000) {fd} d"
    " AS BIGINT)"
)
_TS_RESID_SQL = (
    "CAST(y_cents AS DECIMAL(38,0)) * 1000000"
    " - CAST(ts_slope_micro AS DECIMAL(38,0)) * x"
)


def _theil_sen_oracle() -> str:
    return """
WITH yr AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) - 1992 AS BIGINT) AS x,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
 pr AS (
  SELECT a.n_name,
         b.y_cents - a.y_cents AS dy,
         b.x - a.x AS d
  FROM yr a JOIN yr b ON a.n_name = b.n_name AND a.x < b.x),
 sl AS (
  SELECT n_name,
         {slope} AS slope_micro
  FROM pr),
 slw AS (
  SELECT n_name, slope_micro,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY slope_micro) AS rn,
         CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS k
  FROM sl),
 med AS (
  SELECT n_name, k AS n_pairs, slope_micro AS ts_slope_micro
  FROM slw WHERE rn = (k + 1) // 2),
 res AS (
  SELECT yr.n_name, med.n_pairs, med.ts_slope_micro,
         {resid} AS resid_micro
  FROM yr JOIN med ON yr.n_name = med.n_name),
 resw AS (
  SELECT n_name, n_pairs, ts_slope_micro, resid_micro,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY resid_micro) AS rn,
         CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS k
  FROM res)
SELECT n_name, n_pairs, ts_slope_micro,
       CAST(resid_micro AS BIGINT) AS ts_intercept_micro
FROM resw WHERE rn = (k + 1) // 2
ORDER BY n_name
""".format(
        slope=_TS_SLOPE_SQL.format(fd="//"),
        resid=_TS_RESID_SQL,
    )


@register("theil_sen_by_nation", oracle=_theil_sen_oracle())
def theil_sen_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Theil-Sen robust trend over the yearly order-revenue
    series: slope = the MEDIAN of all pairwise slopes (micro-cents per
    year), intercept = the median residual at that slope — the
    robust-regression twin of ols_trend_by_nation (least squares bends
    to a single corrupted year; the pairwise-slope median shrugs off
    up to ~29% outliers), completing the regression family the way
    grouped_mad_outliers completes the dispersion family.

    Scale shape: identical to ols_trend until the fact table has
    already collapsed — one orders scan through two dimension
    equi-joins into the per-(nation, year) exact-cents frame (25 x ~7
    rows), so the O(k^2) pairwise self-join runs on KB-sized data (21
    pairs per nation) regardless of corpus size. At 100 TB the fact
    table is touched exactly once; the robust machinery never sees
    fact-sized data.

    Determinism: yearly cents are exact BIGINTs; each pairwise slope
    floor-quantizes to micro-cents through the shared pmod identity
    (exact integer division in both engines, floor semantics pinned
    for negative slopes); the discrete medians are picked EXPLICITLY —
    row_number == (k+1) div 2 over the ordered partition, the lower
    median, identical SQL in both engines — because Spark's
    percentile_disc funnels BIGINT through DOUBLE internally and
    returned 22486538630000000 for a partition whose actual 4th-of-7
    value was ...001 (> 2^53; caught by this row's sf0.1 differential
    during development — percentile_disc is fine for doubles and
    sub-2^53 integers like the mode/percentile row's prices, never for
    micro-scaled BIGINTs). No float anywhere in the row.

    Overflow headroom (r13 ADVICE): the micro-scaled products run in
    DECIMAL(38,0) on both engines (exact to 1e38 — effectively
    unbounded), so int64 wraparound cannot silently corrupt the
    ordering or the medians at any sf; only the final BIGINT output
    cast bounds the row (|value| < 2^63, i.e. yearly per-nation
    revenue under ~9.2e12 cents — sf ~50-100 on this generator), and
    it fails LOUDLY on both engines past that (Spark's ANSI-default
    decimal cast raises CAST_OVERFLOW, DuckDB raises — pinned in
    tests/test_r14_ops.py)."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") - F.lit(1992)).cast("long").alias("x"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("y_cents")
        )
        # 25 x ~7 rows referenced by the pair join (both sides) and the
        # residual pass — checkpoint so the fact aggregation runs once
        .localCheckpoint(eager=True)
    )
    a = yr.select(
        F.col("n_name"), F.col("x").alias("xa"), F.col("y_cents").alias("ya")
    )
    b = yr.select(
        F.col("n_name"), F.col("x").alias("xb"), F.col("y_cents").alias("yb")
    )
    pr = a.join(b, "n_name").where(F.col("xa") < F.col("xb")).select(
        "n_name",
        (F.col("yb") - F.col("ya")).alias("dy"),
        (F.col("xb") - F.col("xa")).alias("d"),
    )
    sl = pr.select(
        "n_name",
        F.expr(_TS_SLOPE_SQL.format(fd="div")).alias("slope_micro"),
    )
    grp = Window.partitionBy("n_name")
    s_ord = grp.orderBy("slope_micro")
    med = (
        sl.select(
            "n_name",
            "slope_micro",
            F.row_number().over(s_ord).alias("rn"),
            F.count(F.lit(1)).over(grp).cast("long").alias("k"),
        )
        .where(F.expr("rn = (k + 1) div 2"))
        .select(
            "n_name",
            F.col("k").alias("n_pairs"),
            F.col("slope_micro").alias("ts_slope_micro"),
        )
    )
    res = yr.join(F.broadcast(med), "n_name").select(
        "n_name",
        "n_pairs",
        "ts_slope_micro",
        F.expr(_TS_RESID_SQL).alias("resid_micro"),
    )
    r_ord = grp.orderBy("resid_micro")
    return (
        res.select(
            "n_name",
            "n_pairs",
            "ts_slope_micro",
            "resid_micro",
            F.row_number().over(r_ord).alias("rn"),
            F.count(F.lit(1)).over(grp).cast("long").alias("k"),
        )
        .where(F.expr("rn = (k + 1) div 2"))
        .select(
            "n_name",
            "n_pairs",
            "ts_slope_micro",
            F.expr("CAST(resid_micro AS BIGINT)").alias(
                "ts_intercept_micro"
            ),
        )
        .orderBy("n_name")
    )


# Grouped isotonic regression (Barlow et al. 1972; Robertson-Wright-
# Dykstra 1988): the L2-optimal NON-DECREASING fit to each nation's
# yearly revenue series — the shape-constrained member completing the
# regression family (OLS = least squares line, Theil-Sen = robust
# line, isotonic = monotone step function, no parametric form at all).
# Computed via the exact MINIMAX characterization instead of the
# sequential PAVA pool loop: fit(i) = max over j<=i of min over k>=i
# of mean(y[j..k]) — identical to PAVA's pooled-block means (the
# classical equivalence; tests/test_r14_ops.py pins it against a
# pure-Python Fraction PAVA), but expressible as two tiny grouped
# aggregations over the interval-mean table, so BOTH engines run the
# same declarative form and no driver loop exists.
#
# Exactness: interval means are rationals sum/len with len <= the
# series length; every len in 1..10 divides 2520 (= lcm(1..10)), so
# mean * 2520 = sum * (2520 div len) is an exact integer — the
# scaled-integer discipline (CUSUM's n*P - t*S form) applied to
# rational means. The product folds through DECIMAL(38,0) on both
# engines (the r14 Theil-Sen rule: selection stays exact at ANY sf;
# only the final BIGINT output casts bound the row, loudly). Series
# longer than 10 points would need a larger scaling constant — this
# row's series is the <= 7 TPC-H order years, documented here.
def _isotonic_oracle() -> str:
    return """
WITH yr AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) - 1992 AS BIGINT) AS x,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
 p AS (
  SELECT n_name, x, y_cents,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY x)
              AS BIGINT) AS t,
         CAST(sum(y_cents) OVER (PARTITION BY n_name ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s
  FROM yr),
 iv AS (
  SELECT b.n_name, b.tb, e.te,
         CAST(e.se - b.sb AS DECIMAL(38,0))
           * (2520 // (e.te - b.tb + 1)) AS ms
  FROM (SELECT n_name, t AS tb, s - y_cents AS sb FROM p) b
  JOIN (SELECT n_name, t AS te, s AS se FROM p) e
    ON b.n_name = e.n_name AND b.tb <= e.te),
 mn AS (
  SELECT pt.n_name, pt.x, pt.y_cents, pt.t, iv.tb, min(iv.ms) AS mn
  FROM p pt JOIN iv
    ON pt.n_name = iv.n_name AND iv.tb <= pt.t AND iv.te >= pt.t
  GROUP BY 1, 2, 3, 4, 5),
 fit AS (
  SELECT n_name, x, y_cents, max(mn) AS fs FROM mn GROUP BY 1, 2, 3)
SELECT n_name, x, y_cents,
       CAST(fs AS BIGINT) AS iso_scaled,
       CAST(CAST(CAST(fs AS BIGINT) // 2520 AS DECIMAL(38,0)) * 1000000
            + ((CAST(fs AS BIGINT) % 2520) * 1000000) // 2520
            AS BIGINT) AS iso_micro
FROM fit
ORDER BY n_name, x
"""


@register("isotonic_trend_by_nation", oracle=_isotonic_oracle())
def isotonic_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation isotonic (monotone non-decreasing) regression over
    the yearly order-revenue series, via the exact minimax form
    fit(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) — equal to PAVA's
    pooled means (pinned against a pure-Python Fraction PAVA in
    tests/test_r14_ops.py). Output per (nation, year): the observed
    exact cents, the fit as an exact scaled integer (mean * 2520,
    2520 = lcm(1..10) so every interval length <= 10 divides it), and
    the fit floor-quantized to micro-cents. The shape-constrained
    member beside ols_trend_by_nation (parametric line) and
    theil_sen_by_nation (robust line): isotonic answers "is this
    series consistent with monotone growth, and where does it
    violate" with no functional form assumed — the calibration /
    dose-response / trend-test primitive (and exactly scikit-learn's
    IsotonicRegression semantics, grouped).

    Scale shape (the theil_sen discipline): one orders scan through
    two dimension equi-joins collapses the fact table to the 25 x ~7
    (nation, year) frame; the interval table (<= k^2/2 rows per
    nation), the minimax joins, and both grouped aggregations run on
    that KB-sized frame — at 100 TB the fact table is touched exactly
    once and the isotonic machinery never sees fact-sized data. The
    k^2 interval blowup is bounded by the series length (a domain
    constant: years), never by corpus size.

    Determinism: yearly cents are exact BIGINTs; interval means scale
    to exact integers through the lcm trick; the minimax selection
    compares DECIMAL(38,0) values (exact at any sf — the r14
    overflow-fold rule), so both engines pick identical fits; the
    micro-cent quantization is the positive-branch split identity
    (fs >= 0: revenues are positive) with its products in
    DECIMAL(38,0). Output casts are loud past int64 (sf ~4000 for
    iso_scaled). No float anywhere in the row."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") - F.lit(1992)).cast("long").alias("x"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("y_cents")
        )
    )
    wn = Window.partitionBy("n_name").orderBy("x")
    run = wn.rowsBetween(Window.unboundedPreceding, 0)
    # p is referenced three times (interval begins, interval ends, the
    # point frame) — eager checkpoint so the fact aggregation and the
    # window run once (the theil_sen lineage discipline).
    p = yr.select(
        "n_name",
        "x",
        "y_cents",
        F.row_number().over(wn).cast("long").alias("t"),
        F.sum("y_cents").over(run).cast("long").alias("s"),
    ).localCheckpoint(eager=True)
    pb = p.select(
        "n_name",
        F.col("t").alias("tb"),
        (F.col("s") - F.col("y_cents")).alias("sb"),
    )
    pe = p.select(
        "n_name", F.col("t").alias("te"), F.col("s").alias("se")
    )
    iv = (
        pb.join(pe, "n_name")
        .where(F.col("tb") <= F.col("te"))
        .select(
            "n_name",
            "tb",
            "te",
            F.expr(
                "CAST(se - sb AS DECIMAL(38,0))"
                " * (2520 div (te - tb + 1))"
            ).alias("ms"),
        )
    )
    mn = (
        p.select("n_name", "x", "y_cents", "t")
        .join(iv, "n_name")
        .where((F.col("tb") <= F.col("t")) & (F.col("te") >= F.col("t")))
        .groupBy("n_name", "x", "y_cents", "t", "tb")
        .agg(F.min("ms").alias("mn"))
    )
    fit = mn.groupBy("n_name", "x", "y_cents").agg(F.max("mn").alias("fs"))
    return fit.select(
        "n_name",
        "x",
        "y_cents",
        F.expr("CAST(fs AS BIGINT)").alias("iso_scaled"),
        F.expr(
            "CAST(CAST(CAST(fs AS BIGINT) div 2520 AS DECIMAL(38,0))"
            " * 1000000"
            " + ((CAST(fs AS BIGINT) % 2520) * 1000000) div 2520"
            " AS BIGINT)"
        ).alias("iso_micro"),
    ).orderBy("n_name", "x")


# Pearson chi-square test of independence (Pearson 1900) on the
# status x priority contingency table — the categorical-ASSOCIATION
# member of the stats family: corr/covar measure numeric association,
# OLS/Theil-Sen/isotonic fit trends, the MAD fence and CUSUM detect
# outliers/shifts; THIS answers "are two categorical dimensions
# dependent at all, and how strongly" (the feature-selection /
# data-drift screening primitive). chi2 = sum over cells of
# (O - E)^2 / E with E = R*C/n; multiplying through by n the per-cell
# term is (n*O - R*C)^2 / (n*R*C) — numerator and denominator are
# exact DECIMAL(38,0) integer products (the overflow-fold rule:
# (n*O - R*C)^2 <= n^4 stays inside 1e38 up to n ~ 1.7e9 rows), each
# term folds through round(double, 12) -> DECIMAL(28,12) so the
# 15-term sum is order-independent, and only the final statistic is a
# rounded double. Cramer's V = sqrt(chi2 / (n * min(r-1, c-1)))
# normalizes to [0, 1]. ONE expression string shared verbatim by both
# engines for the sensitive term.
_CHI_NUM_SQL = (
    "(CAST(n_tot AS DECIMAL(38,0)) * o_cell"
    " - CAST(r_tot AS DECIMAL(38,0)) * c_tot)"
)
_CHI_TERM_SQL = (
    f"CAST(round(CAST({_CHI_NUM_SQL} * {_CHI_NUM_SQL} AS DOUBLE)"
    " / CAST(CAST(n_tot AS DECIMAL(38,0)) * r_tot * c_tot AS DOUBLE),"
    " 12) AS DECIMAL(28,12))"
)
_CHI_FINAL_SQL = "round(CAST(chi2_sum AS DOUBLE), 8)"
_CHI_V_SQL = (
    "round(sqrt(CAST(chi2_sum AS DOUBLE)"
    " / (CAST(n AS DOUBLE)"
    " * CAST(least(r_cnt - 1, c_cnt - 1) AS DOUBLE))), 8)"
)


def _chi_square_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS o_cell
  FROM orders GROUP BY 1, 2),
 w AS (
  SELECT status, priority, o_cell,
         CAST(sum(o_cell) OVER (PARTITION BY status) AS BIGINT) AS r_tot,
         CAST(sum(o_cell) OVER (PARTITION BY priority) AS BIGINT) AS c_tot,
         CAST(sum(o_cell) OVER () AS BIGINT) AS n_tot
  FROM cells),
 t AS (
  SELECT status, priority, n_tot, {_CHI_TERM_SQL} AS term FROM w),
 agg AS (
  SELECT CAST(max(n_tot) AS BIGINT) AS n,
         CAST(count(DISTINCT status) AS BIGINT) AS r_cnt,
         CAST(count(DISTINCT priority) AS BIGINT) AS c_cnt,
         sum(term) AS chi2_sum
  FROM t)
SELECT n, r_cnt, c_cnt,
       CAST((r_cnt - 1) * (c_cnt - 1) AS BIGINT) AS dof,
       {_CHI_FINAL_SQL} AS chi2,
       {_CHI_V_SQL} AS cramers_v
FROM agg
"""


@register("chi_square_independence", oracle=_chi_square_oracle())
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test + Cramer's V over the
    order status x priority contingency table — one summary row
    (n, r_cnt, c_cnt, dof, chi2, cramers_v). See the module constants
    for the exact-arithmetic form (the per-cell (n*O - R*C)^2 /
    (n*R*C) terms run on DECIMAL(38,0) integer products, fold through
    round(·,12) DECIMAL sums, and only the final statistic is a
    rounded double).

    Scale shape: ONE orders scan partial-aggregates to the |status| x
    |priority| cell frame (15 rows at any corpus size); the marginal
    totals are windows over that frame (the single-partition window
    touches 15 rows, not the fact table), and everything after is a
    1-row aggregate. The categorical-association screening shape: at
    100 TB the fact table contributes one map-side count pass,
    nothing else.

    Determinism: cell counts are exact BIGINTs; every float fold is
    the shared-verbatim term expression in both engines; the term sum
    is an exact DECIMAL(28,12) so cell order cannot move the
    statistic."""
    cells = (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o_cell"))
    )
    w = cells.select(
        "status",
        "priority",
        "o_cell",
        F.sum("o_cell")
        .over(Window.partitionBy("status"))
        .cast("long")
        .alias("r_tot"),
        F.sum("o_cell")
        .over(Window.partitionBy("priority"))
        .cast("long")
        .alias("c_tot"),
        F.sum("o_cell")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n_tot"),
    )
    t = w.select(
        "status", "priority", "n_tot", F.expr(_CHI_TERM_SQL).alias("term")
    )
    agg = t.agg(
        F.max("n_tot").cast("long").alias("n"),
        F.countDistinct("status").cast("long").alias("r_cnt"),
        F.countDistinct("priority").cast("long").alias("c_cnt"),
        F.sum("term").alias("chi2_sum"),
    )
    return agg.select(
        "n",
        "r_cnt",
        "c_cnt",
        F.expr("CAST((r_cnt - 1) * (c_cnt - 1) AS BIGINT)").alias("dof"),
        F.expr(_CHI_FINAL_SQL).alias("chi2"),
        F.expr(_CHI_V_SQL).alias("cramers_v"),
    )


# Mann-Whitney U / Wilcoxon rank-sum (Mann & Whitney 1947): the
# NONPARAMETRIC two-sample test — the hypothesis-testing member beside
# chi_square_independence (categorical x categorical): does the price
# DISTRIBUTION differ between two order-priority segments, with no
# normality assumption. U counts pairs (a, b) with a > b (+1/2 per
# tie); U / (n1*n2) is the probability-of-superiority — exactly
# ROC-AUC, reported in exact ppm. Doubling clears the tie halves:
# U2 = sum over distinct values v of a_cnt(v) * (2*b_below(v) +
# b_cnt(v)) — all exact integers off the value histogram.
#
# Scale shape — the grouped_mad histogram discipline EXTENDED with a
# two-level distributed prefix sum: exact ranks need a total order
# over values, but a global ORDER BY v window would be a fact-sized
# single-partition sort (the scale-killer class the plan audit
# exists to catch). Instead: (1) ONE conditional-agg pass collapses
# the fact subset to the distinct-value histogram; (2) values hash
# into coarse price buckets — the in-bucket cumulative window is
# PARTITIONED by bucket (parallel, bounded state); (3) the bucket
# TOTALS frame (tens of rows) takes the only single-partition window;
# (4) b_below(v) = bucket-prefix + in-bucket prefix. Same SQL in both
# engines; the single-partition exchange touches the bucket frame,
# never the fact table or the value domain.
_MWU_A = "'1-URGENT'"
_MWU_B = "'5-LOW'"
_MWU_BUCKET = 1000000  # $10k buckets over o_totalprice cents
# z via the normal approximation (no-tie variance; cent-valued prices
# make ties negligible — U itself stays tie-exact): ONE shared string.
_MWU_Z_SQL = (
    "round((CAST(u2_a AS DOUBLE) / 2.0"
    " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
    " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0), 8)"
)
# The ppm division needs EXACT integer floor division on operands
# past 2^53 (u2_a * 500000 ~ 9e16 at sf1). The usual shared-text
# discipline breaks here by necessity: DuckDB's // on DECIMALs
# silently falls back to FLOAT division (tested — the r13
# percentile_disc trap's sibling), so the oracle divides HUGEINTs
# (native int128, exact), while Spark's div on DECIMAL(38,0) is exact
# integral division. Same rational, same floor, identical BIGINT —
# the split is syntax-only and pinned in tests/test_r14_ops.py.
_MWU_AUC_SPARK_SQL = (
    "CAST((CAST(u2_a AS DECIMAL(38,0)) * 500000)"
    " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
)
_MWU_AUC_DUCK_SQL = (
    "CAST((CAST(u2_a AS HUGEINT) * 500000)"
    " // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)"
)


def _mwu_oracle() -> str:
    return f"""
WITH f AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority = {_MWU_A} THEN 1 ELSE 0 END AS is_a
  FROM orders
  WHERE o_orderpriority IN ({_MWU_A}, {_MWU_B})),
 h AS (
  SELECT v, v // {_MWU_BUCKET} AS bkt,
         CAST(sum(is_a) AS BIGINT) AS a_cnt,
         CAST(sum(1 - is_a) AS BIGINT) AS b_cnt
  FROM f GROUP BY 1, 2),
 bt AS (
  SELECT bkt, CAST(sum(b_cnt) AS BIGINT) AS b_tot FROM h GROUP BY 1),
 bp AS (
  SELECT bkt,
         CAST(sum(b_tot) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b_tot
              AS BIGINT) AS b_before_bkt
  FROM bt),
 c AS (
  SELECT h.v, h.a_cnt, h.b_cnt,
         bp.b_before_bkt
           + CAST(sum(h.b_cnt) OVER (PARTITION BY h.bkt ORDER BY h.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - h.b_cnt AS BIGINT) AS b_below
  FROM h JOIN bp ON h.bkt = bp.bkt),
 agg AS (
  SELECT CAST(sum(a_cnt) AS BIGINT) AS n1,
         CAST(sum(b_cnt) AS BIGINT) AS n2,
         CAST(sum(CAST(a_cnt AS DECIMAL(38,0))
                  * (2 * b_below + b_cnt)) AS BIGINT) AS u2_a
  FROM c)
SELECT n1, n2, u2_a,
       CAST(2 * (CAST(n1 AS DECIMAL(38,0)) * n2) - u2_a AS BIGINT)
         AS u2_b,
       {_MWU_AUC_DUCK_SQL} AS auc_ppm,
       {_MWU_Z_SQL} AS z_score
FROM agg
"""


@register("mann_whitney_u", oracle=_mwu_oracle())
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the urgent and low order-
    priority price distributions — one summary row (n1, n2, u2_a,
    u2_b, auc_ppm, z_score) where u2_* are the tie-exact doubled U
    statistics, auc_ppm is the probability-of-superiority (ROC-AUC)
    in exact ppm, and z is the shared-text normal approximation. See
    the module comment for the two-level distributed prefix-sum that
    keeps exact ranks WITHOUT a fact-sized single-partition sort —
    the identity U2_a + U2_b = 2*n1*n2 is emitted (u2_b derived) and
    pinned with a pure-Python reference in tests/test_r14_ops.py.

    Scale shape: one orders scan with the priority filter pushed to
    the parquet scan collapses to the distinct-value histogram; the
    in-bucket cumulative windows are partitioned by $10k price bucket
    (parallel, bounded per-task state); only the bucket-totals frame
    (tens of rows at ANY corpus) crosses a single-partition window.
    At 100 TB: one scan, one histogram shuffle, KB-sized everything
    else — the exact-rank-test shape that usually forces a global
    sort, without one.

    Determinism: counts and U2 are exact integers (products folded
    through DECIMAL(38,0), loud BIGINT output casts); auc_ppm is
    integer floor division; z is one shared-verbatim float expression
    rounded to 8 dp."""
    f = (
        T(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin(
                _MWU_A.strip("'"), _MWU_B.strip("'")
            )
        )
        .select(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)"
            ).alias("v"),
            F.expr(
                f"CASE WHEN o_orderpriority = {_MWU_A} THEN 1 ELSE 0 END"
            ).alias("is_a"),
        )
    )
    h = f.groupBy(
        "v", F.expr(f"v div {_MWU_BUCKET}").alias("bkt")
    ).agg(
        F.sum("is_a").cast("long").alias("a_cnt"),
        F.sum(F.expr("1 - is_a")).cast("long").alias("b_cnt"),
    )
    bt = h.groupBy("bkt").agg(F.sum("b_cnt").cast("long").alias("b_tot"))
    bw = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bp = bt.select(
        "bkt",
        (F.sum("b_tot").over(bw) - F.col("b_tot"))
        .cast("long")
        .alias("b_before_bkt"),
    )
    vw = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        h.join(F.broadcast(bp), "bkt")
        .select(
            "v",
            "a_cnt",
            "b_cnt",
            (
                F.col("b_before_bkt")
                + (F.sum("b_cnt").over(vw) - F.col("b_cnt")).cast("long")
            ).alias("b_below"),
        )
    )
    agg = c.agg(
        F.sum("a_cnt").cast("long").alias("n1"),
        F.sum("b_cnt").cast("long").alias("n2"),
        F.expr(
            "CAST(sum(CAST(a_cnt AS DECIMAL(38,0))"
            " * (2 * b_below + b_cnt)) AS BIGINT)"
        ).alias("u2_a"),
    )
    return agg.select(
        "n1",
        "n2",
        "u2_a",
        F.expr(
            "CAST(2 * (CAST(n1 AS DECIMAL(38,0)) * n2) - u2_a AS BIGINT)"
        ).alias("u2_b"),
        F.expr(_MWU_AUC_SPARK_SQL).alias("auc_ppm"),
        F.expr(_MWU_Z_SQL).alias("z_score"),
    )


# Kaplan-Meier product-limit estimator (Kaplan & Meier 1958): the
# TIME-TO-EVENT member of the stats family — chi-square/MWU test
# association and distribution shift, the trend rows fit curves; THIS
# estimates "how long until the event happens, with observations that
# haven't happened yet counted correctly" — the retention / churn /
# time-to-failure primitive, and the one shape none of the other rows
# can express because right-CENSORING (a customer's last order has no
# next order YET) biases every naive duration average downward.
# Here: the repeat-purchase curve S(t) = P(next order later than t
# days) per customer order gap, gaps from each customer's last order
# to the corpus's max order date entering as censored.
#
# Exactness: d_i (events) and the at-risk counts n_i are exact BIGINTs
# off the duration histogram; each factor ln((n_i - d_i)/n_i) is ONE
# shared-text float term folded through round(., 12) ->
# DECIMAL(28,12) so the cumulative log-survival sum is exact and
# order-independent (the Adamic-Adar fold discipline applied to a
# cumulative product); only the final exp(.) is a float, rounded to
# 8 dp. The d_i = n_i exhaustion case (S hits exactly 0; ln(0) is
# NULL in Spark but RAISES in DuckDB — a cross-engine trap where the
# oracle side would crash the differential) is handled structurally: the term is excluded and a cumulative max flag pins
# survival_8dp to exact 0.0 from that time on, in both engines.
_KM_TERM_SQL = (
    "CAST(CASE WHEN n_event < n_risk THEN"
    " round(ln(CAST(n_risk - n_event AS DOUBLE)"
    " / CAST(n_risk AS DOUBLE)), 12)"
    " ELSE 0.0 END AS DECIMAL(28,12))"
)
_KM_SURV_SQL = (
    "CASE WHEN zf = 1 THEN CAST(0.0 AS DOUBLE)"
    " ELSE round(exp(CAST(cum_log AS DOUBLE)), 8) END"
)


def _km_oracle() -> str:
    return f"""
WITH g AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
         lead(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders),
 m AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
 d AS (
  SELECT CAST(date_diff('day', od, coalesce(nxt, m.maxd)) AS BIGINT)
           AS dur_days,
         CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
  FROM g CROSS JOIN m),
 h AS (
  SELECT dur_days, CAST(sum(ev) AS BIGINT) AS n_event,
         CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM d GROUP BY 1),
 r AS (
  SELECT dur_days, n_event, n_censored,
         CAST(sum(n_event + n_censored) OVER () AS BIGINT)
           - CAST(sum(n_event + n_censored)
                  OVER (ORDER BY dur_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (n_event + n_censored) AS BIGINT) AS n_risk
  FROM h),
 t AS (
  SELECT dur_days, n_event, n_censored, n_risk,
         {_KM_TERM_SQL} AS term,
         CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END AS z
  FROM r),
 c AS (
  SELECT dur_days, n_event, n_censored, n_risk,
         sum(term) OVER (ORDER BY dur_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_log,
         max(z) OVER (ORDER BY dur_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS zf
  FROM t)
SELECT dur_days, n_risk, n_event, n_censored,
       {_KM_SURV_SQL} AS survival_8dp
FROM c WHERE n_event > 0
ORDER BY dur_days
"""


@register("kaplan_meier_repurchase", oracle=_km_oracle())
def kaplan_meier_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve over customer
    repeat-purchase gaps: one row per event time (gap in days at
    which at least one next order arrived) with the at-risk count,
    event count, censored count, and S(t) = P(gap > t) — each
    customer's last order contributes a RIGHT-CENSORED gap to the
    corpus max date, the correction that makes the curve unbiased
    where a plain duration histogram is not (Kaplan & Meier 1958;
    the lifelines KaplanMeierFitter contract, which the pure-Python
    reference in tests/test_r14_ops.py replays with Fractions). The
    time-to-event family member: retention/churn curves, component
    time-to-failure, label-arrival latency for training-data
    freshness — none expressible by the trend/test rows because
    censoring is a first-class part of the estimand.

    Scale shape: one orders scan through ONE per-customer ordered
    window (lead — the sessionize exchange family, fact-sized but
    partitioned by customer) collapses to the duration histogram,
    domain-sized at ANY corpus (gaps in days are bounded by the date
    span: ~2.5k distinct values at 100 TB exactly as at sf0.001); the
    corpus max date is a 1-row aggregate cross-joined (the sanctioned
    1-row pattern); the at-risk/cumulative machinery is two
    single-partition windows over THAT KB frame, never the fact
    table. The KM shape that usually forces a global ordered pass,
    bounded to the duration domain instead.

    Determinism: durations and counts are exact BIGINTs; the ordered
    cumulative sums run on round(., 12) -> DECIMAL(28,12) folds of
    the shared-text per-time factor (order-independent, exact); the
    d = n exhaustion row (ln(0): Spark NULL vs DuckDB raising — the
    load-bearing guard is negative-control-pinned in
    tests/test_r14_ops.py) is structurally excluded and an exact 0.0 is pinned by the
    cumulative flag; the only float emission is the final
    round(exp(.), 8)."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    wc = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    g = o.select(
        "o_custkey", "od", F.lead("od").over(wc).alias("nxt")
    )
    m = o.agg(F.max("od").alias("maxd"))
    d = g.crossJoin(F.broadcast(m)).select(
        F.expr(
            "CAST(datediff(coalesce(nxt, maxd), od) AS BIGINT)"
        ).alias("dur_days"),
        F.expr("CASE WHEN nxt IS NULL THEN 0 ELSE 1 END").alias("ev"),
    )
    h = d.groupBy("dur_days").agg(
        F.sum("ev").cast("long").alias("n_event"),
        F.sum(F.expr("1 - ev")).cast("long").alias("n_censored"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = h.select(
        "dur_days",
        "n_event",
        "n_censored",
        (
            F.sum(F.col("n_event") + F.col("n_censored")).over(w_all)
            - (
                F.sum(F.col("n_event") + F.col("n_censored")).over(w_cum)
                - (F.col("n_event") + F.col("n_censored"))
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    t = r.select(
        "dur_days",
        "n_event",
        "n_censored",
        "n_risk",
        F.expr(_KM_TERM_SQL).alias("term"),
        F.expr("CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END").alias("z"),
    )
    c = t.select(
        "dur_days",
        "n_event",
        "n_censored",
        "n_risk",
        F.sum("term").over(w_cum).alias("cum_log"),
        F.max("z").over(w_cum).alias("zf"),
    )
    return (
        c.where(F.col("n_event") > 0)
        .select(
            "dur_days",
            "n_risk",
            "n_event",
            "n_censored",
            F.expr(_KM_SURV_SQL).alias("survival_8dp"),
        )
        .orderBy("dur_days")
    )


# Log-rank / Mantel-Cox two-sample survival test (Mantel 1966; Peto &
# Peto 1972): does the repeat-purchase survival curve differ between
# two strata — the hypothesis-TEST companion to kaplan_meier_repurchase
# exactly as mann_whitney_u is to the price distributions and
# chi_square_independence is to the contingency table: KM estimates
# the curve, THIS tests whether urgent-started gaps genuinely close
# faster than low-priority-started ones, with censoring handled in the
# estimand (a naive mean-gap comparison is biased by exactly the
# censored tail). Each gap observation is stratified by the priority
# of the order that STARTS it; at every event time t the observed
# stratum-A events d_a compare against the hypergeometric expectation
# e_a = n_a * d / n over the combined risk set, with variance
# v = n_a*n_b*d*(n-d) / (n^2*(n-1)); chi2 = (sum(d_a - e_a))^2 /
# sum(v) ~ chi2(1) under H0 (identical hazards).
#
# Exactness: all counts and risk sets are exact BIGINTs off the
# stratified duration histogram; each per-time term keeps its
# numerator/denominator as exact DECIMAL(38,0) integer products
# (the chi-square overflow-fold rule: n^4 stays inside 1e38 to
# n ~ 1.7e9 at risk) with ONE float division, folded through
# round(., 12) -> DECIMAL(28,12) so the sums are order-independent;
# only the final statistics are floats, rounded to 8 dp. ONE
# expression string per term, shared verbatim by both engines.
_LR_A = "'1-URGENT'"
_LR_B = "'5-LOW'"
_LR_OE_SQL = (
    "CAST(round(CAST(d_a AS DOUBLE)"
    " - CAST(CAST(n_a AS DECIMAL(38,0)) * (d_a + d_b) AS DOUBLE)"
    " / CAST(n_a + n_b AS DOUBLE), 12) AS DECIMAL(28,12))"
)
_LR_V_SQL = (
    "CAST(CASE WHEN n_a + n_b > 1 THEN"
    " round(CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * (d_a + d_b)"
    " * (n_a + n_b - d_a - d_b) AS DOUBLE)"
    " / CAST(CAST(n_a + n_b AS DECIMAL(38,0)) * (n_a + n_b)"
    " * (n_a + n_b - 1) AS DOUBLE), 12)"
    " ELSE 0.0 END AS DECIMAL(28,12))"
)
_LR_CHI2_SQL = (
    "round(CAST(oe_sum AS DOUBLE) * CAST(oe_sum AS DOUBLE)"
    " / CAST(v_sum AS DOUBLE), 8)"
)
_LR_Z_SQL = (
    "round(CAST(oe_sum AS DOUBLE) / sqrt(CAST(v_sum AS DOUBLE)), 8)"
)


def _logrank_oracle() -> str:
    return f"""
WITH g AS (
  SELECT o_custkey, o_orderpriority AS pri,
         CAST(o_orderdate AS DATE) AS od,
         lead(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders),
 m AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
 d AS (
  SELECT CAST(date_diff('day', od, coalesce(nxt, m.maxd)) AS BIGINT)
           AS dur_days,
         pri,
         CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
  FROM g CROSS JOIN m
  WHERE pri IN ({_LR_A}, {_LR_B})),
 h AS (
  SELECT dur_days,
         CAST(sum(CASE WHEN pri = {_LR_A} THEN ev ELSE 0 END) AS BIGINT)
           AS d_a,
         CAST(sum(CASE WHEN pri = {_LR_A} THEN 1 - ev ELSE 0 END)
              AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN pri = {_LR_B} THEN ev ELSE 0 END) AS BIGINT)
           AS d_b,
         CAST(sum(CASE WHEN pri = {_LR_B} THEN 1 - ev ELSE 0 END)
              AS BIGINT) AS c_b
  FROM d GROUP BY 1),
 r AS (
  SELECT dur_days, d_a, d_b,
         CAST(sum(d_a + c_a) OVER () AS BIGINT)
           - CAST(sum(d_a + c_a)
                  OVER (ORDER BY dur_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (d_a + c_a) AS BIGINT) AS n_a,
         CAST(sum(d_b + c_b) OVER () AS BIGINT)
           - CAST(sum(d_b + c_b)
                  OVER (ORDER BY dur_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - (d_b + c_b) AS BIGINT) AS n_b
  FROM h),
 t AS (
  SELECT {_LR_OE_SQL} AS oe, {_LR_V_SQL} AS v, d_a, d_b
  FROM r WHERE d_a + d_b > 0),
 agg AS (
  SELECT CAST(sum(d_a) AS BIGINT) AS events_a,
         CAST(sum(d_b) AS BIGINT) AS events_b,
         sum(oe) AS oe_sum, sum(v) AS v_sum
  FROM t)
SELECT events_a, events_b,
       round(CAST(oe_sum AS DOUBLE), 8) AS o_minus_e_a,
       round(CAST(v_sum AS DOUBLE), 8) AS lr_variance,
       {_LR_CHI2_SQL} AS logrank_chi2,
       {_LR_Z_SQL} AS z_score
FROM agg
"""


@register("logrank_repurchase_test", oracle=_logrank_oracle())
def logrank_repurchase_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the urgent-started and
    low-priority-started repeat-purchase gap survival curves — one
    summary row (events_a, events_b, o_minus_e_a, lr_variance,
    logrank_chi2, z_score). The hypothesis-test companion to
    kaplan_meier_repurchase (see the module comment for the
    hypergeometric form): z < 0 means stratum A (urgent) repurchases
    FASTER than chance given the shared risk sets, with right-censored
    gaps counted correctly in every risk set — the estimand a naive
    mean-gap comparison biases. Pure-Python replay (scipy-free
    lifelines logrank_test contract) pinned in tests/test_r14_ops.py.

    Scale shape (the kaplan_meier shape exactly): one orders scan
    through the per-customer lead window collapses to the STRATIFIED
    duration histogram (domain-sized: <= date-span distinct gaps at
    any corpus); the two at-risk cumulative windows and the 1-row
    final aggregation run on that KB frame; the corpus max date is
    the sanctioned 1-row broadcast cross join. At 100 TB the fact
    table is touched once.

    Determinism: counts and risk sets are exact BIGINTs; each
    per-time O-E and variance term keeps exact DECIMAL(38,0) integer
    products around ONE shared-text float division, folded through
    round(., 12) -> DECIMAL(28,12) sums; the n = 1 variance guard is
    structural in both engines; final statistics round to 8 dp."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    wc = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    g = o.select("pri", "od", F.lead("od").over(wc).alias("nxt"))
    m = o.agg(F.max("od").alias("maxd"))
    d = (
        g.where(F.col("pri").isin(_LR_A.strip("'"), _LR_B.strip("'")))
        .crossJoin(F.broadcast(m))
        .select(
            F.expr(
                "CAST(datediff(coalesce(nxt, maxd), od) AS BIGINT)"
            ).alias("dur_days"),
            "pri",
            F.expr("CASE WHEN nxt IS NULL THEN 0 ELSE 1 END").alias("ev"),
        )
    )
    h = d.groupBy("dur_days").agg(
        F.expr(
            f"CAST(sum(CASE WHEN pri = {_LR_A} THEN ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("d_a"),
        F.expr(
            f"CAST(sum(CASE WHEN pri = {_LR_A} THEN 1 - ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_a"),
        F.expr(
            f"CAST(sum(CASE WHEN pri = {_LR_B} THEN ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("d_b"),
        F.expr(
            f"CAST(sum(CASE WHEN pri = {_LR_B} THEN 1 - ev ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_b"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = h.select(
        "dur_days",
        "d_a",
        "d_b",
        (
            F.sum(F.col("d_a") + F.col("c_a")).over(w_all)
            - (
                F.sum(F.col("d_a") + F.col("c_a")).over(w_cum)
                - (F.col("d_a") + F.col("c_a"))
            )
        )
        .cast("long")
        .alias("n_a"),
        (
            F.sum(F.col("d_b") + F.col("c_b")).over(w_all)
            - (
                F.sum(F.col("d_b") + F.col("c_b")).over(w_cum)
                - (F.col("d_b") + F.col("c_b"))
            )
        )
        .cast("long")
        .alias("n_b"),
    )
    t = r.where(F.col("d_a") + F.col("d_b") > 0).select(
        F.expr(_LR_OE_SQL).alias("oe"),
        F.expr(_LR_V_SQL).alias("v"),
        "d_a",
        "d_b",
    )
    agg = t.agg(
        F.sum("d_a").cast("long").alias("events_a"),
        F.sum("d_b").cast("long").alias("events_b"),
        F.sum("oe").alias("oe_sum"),
        F.sum("v").alias("v_sum"),
    )
    return agg.select(
        "events_a",
        "events_b",
        F.expr("round(CAST(oe_sum AS DOUBLE), 8)").alias("o_minus_e_a"),
        F.expr("round(CAST(v_sum AS DOUBLE), 8)").alias("lr_variance"),
        F.expr(_LR_CHI2_SQL).alias("logrank_chi2"),
        F.expr(_LR_Z_SQL).alias("z_score"),
    )
