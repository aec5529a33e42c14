"""Behavioral / product-analytics catalog: stratified sampling, retention
cohorts, modal values + discrete percentiles, funnel conversion.

The reference has no analytics surface at all; these are the standard
event-analytics operators a warehouse team runs daily, re-expressed as
shuffle-lean Spark plans with DuckDB oracles.

Scale notes:
  - Stratified sampling is a pure filter (md5 bucket vs per-stratum
    threshold) — pushes to the scan, zero shuffle, reproducible across
    engines/retries (same contract as deterministic_sample).
  - Retention reduces events to distinct (user, day) FIRST (one partial-
    agg shuffle on a small key) before any join; the cohort join is then
    users-sized, not events-sized.
  - Funnel stages join events against the *previous stage's* per-user
    timestamps — stage tables shrink monotonically, and each is
    broadcast-joined back to events (users << events always).
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

# Per-stratum sampling thresholds out of 256 hash buckets: oversample the
# rare-but-interesting stratum, undersample the bulk (the usual shape of
# training-data curation).
_STRATA = {"O": 25, "F": 8, "P": 2}


@register(
    "stratified_sample",
    oracle=f"""
SELECT o_orderkey AS order_key, o_orderstatus AS status,
       o_totalprice AS total_price
FROM orders
WHERE {oracle_bucket_sql('o_orderkey')} <
      CASE o_orderstatus WHEN 'O' THEN 25 WHEN 'F' THEN 8 ELSE 2 END
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: each status keeps a different
    hash-bucket share (~10%/3%/0.8%). One scan, one filter, no shuffle —
    and the same keys are kept on every engine, rerun, and scale."""
    o = T(spark, sf_dir, "orders")
    bucket = md5_token_bucket(F.col("o_orderkey"))
    threshold = (
        F.when(F.col("o_orderstatus") == "O", _STRATA["O"])
        .when(F.col("o_orderstatus") == "F", _STRATA["F"])
        .otherwise(_STRATA["P"])
    )
    return o.where(bucket < threshold).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
    )


@register(
    "user_retention_cohorts",
    oracle="""
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
           FROM events GROUP BY 1, 2),
 c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
SELECT c.cohort_day,
       CAST(datediff('day', c.cohort_day, d.day) AS INTEGER) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN c ON d.user_id = c.user_id
GROUP BY 1, 2
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen day
    (cohort), counted on each subsequent active day. Events collapse to
    distinct (user, day) before anything else — the cohort computation
    and join then run on users x days, ~3 orders of magnitude smaller
    than the event log."""
    e = T(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    c = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(c, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "mode_and_percentile_disc",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus AS status, o_orderpriority AS prio,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
 modal AS (SELECT status, prio AS modal_priority, n AS n_modal FROM (
    SELECT *, row_number() OVER (PARTITION BY status
                                 ORDER BY n DESC, prio) AS rn
    FROM counts) t WHERE rn = 1),
 pct AS (SELECT o_orderstatus AS status,
                quantile_disc(o_totalprice, 0.5) AS p50_disc
         FROM orders GROUP BY 1)
SELECT m.status, m.modal_priority, m.n_modal, p.p50_disc
FROM modal m JOIN pct p ON m.status = p.status
""",
)
def mode_and_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value (explicit count + deterministic tie-break — the builtin
    mode() leaves ties unspecified, useless for a differential harness)
    and discrete median (percentile_disc: an actual data value, not an
    interpolation) per status."""
    o = T(spark, sf_dir, "orders")
    counts = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("status").orderBy(F.desc("n"), F.asc("prio"))
    modal = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "status", F.col("prio").alias("modal_priority"),
            F.col("n").alias("n_modal"),
        )
    )
    pct = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50_disc")
    )
    return modal.join(pct, "status")


@register(
    "funnel_conversion",
    oracle="""
WITH s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END)
                   AS t1
            FROM events GROUP BY 1),
 s2 AS (SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 1 DAY
        GROUP BY 1),
 s3 AS (SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL 3 DAY
        GROUP BY 1)
SELECT (SELECT CAST(count(t1) AS BIGINT) FROM s1) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_view_click,
       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_full_funnel
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with per-step windows: first view -> first click
    within 1 day -> first purchase within 3 days. Each stage is a
    broadcast join of the (shrinking) per-user stage table back onto
    events, then a partial-agg min — event rows are never shuffled, only
    re-scanned with a tighter stage filter (3 scans by design). The
    per-user stage frames are each referenced TWICE (next stage's join
    + the stage count), so they are eagerly checkpointed — without
    that, lineage inlining doubled the executed plan to 6 events scans
    (caught by the r12 file_scans baseline feature; the stage frames
    are per-user-sized, the same bound that already makes them
    broadcastable)."""
    e = T(spark, sf_dir, "events")
    s1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    ).localCheckpoint(eager=True)
    s2 = (
        e.join(F.broadcast(s1.where(F.col("t1").isNotNull())), "user_id")
        .where(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    ).localCheckpoint(eager=True)
    s3 = (
        e.join(F.broadcast(s2), "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count("t1").alias("n_view"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_view_click"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_full_funnel"))
    return n1.crossJoin(n2).crossJoin(n3)


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
 tr AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2),
 w AS (
  SELECT prev_type, next_type, n_trans,
         CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
           AS n_from
  FROM tr)
SELECT prev_type, next_type, n_trans, n_from,
       (n_trans * 1000000) // n_from AS p_ppm
FROM w
ORDER BY prev_type, next_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (prev_type -> next_type) pair, the transition
    count and the conditional probability P(next|prev) in exact ppm —
    the user-behavior sequence model beside the funnel (fixed 3-stage
    path) and the sessionizer (gap grouping): THIS estimates the full
    behavioral transition structure, the input to next-event
    prediction, anomaly scoring, and simulation.

    Scale shape: one events scan through ONE per-user ordered window
    (the sessionize/EWMA exchange shape — partition by user, sort by
    (ts, event_id)), then the fact stream collapses to a type x type
    count matrix (|types|^2 rows, KB at any corpus); the row-total join
    and the ppm division run on that matrix frame. At 100 TB nothing
    after the single window touches fact-sized data.

    Determinism: the lag ordering is total per user — ts then the
    unique event_id, so simultaneous events cannot reorder across
    engines or partitionings; counts are exact BIGINTs and the ppm
    quantization is positive-integer floor division (Spark div ==
    DuckDB // on non-negative operands). No float anywhere."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    # row totals via a partition window over the type-matrix frame, NOT
    # a tot-frame self-join: tr referenced twice would re-execute the
    # events scan + window per reference (the scan-count gate class)
    tw = Window.partitionBy("prev_type")
    return (
        tr.select(
            "prev_type",
            "next_type",
            "n_trans",
            F.sum("n_trans").over(tw).cast("long").alias("n_from"),
        )
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            "n_from",
            F.expr("(n_trans * 1000000) div n_from").alias("p_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "event_trigram_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev1,
         lag(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev2
  FROM events),
 tr AS (
  SELECT prev2, prev1, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev2 IS NOT NULL
  GROUP BY 1, 2, 3),
 w AS (
  SELECT prev2, prev1, next_type, n_trans,
         CAST(sum(n_trans) OVER (PARTITION BY prev2, prev1) AS BIGINT)
           AS n_from,
         CAST(sum(n_trans) OVER (PARTITION BY prev1, next_type) AS BIGINT)
           AS n1_trans,
         CAST(sum(n_trans) OVER (PARTITION BY prev1) AS BIGINT)
           AS n1_from
  FROM tr)
SELECT prev2, prev1, next_type, n_trans, n_from,
       (n_trans * 1000000) // n_from AS p2_ppm,
       (n1_trans * 1000000) // n1_from AS p1_ppm,
       (n_trans * 1000000) // n_from
         - (n1_trans * 1000000) // n1_from AS memory_ppm
FROM w
ORDER BY prev2, prev1, next_type
""",
)
def event_trigram_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order (trigram) Markov transitions over per-user event
    sequences: for every (prev2, prev1 -> next) triple, the transition
    count, P(next | prev2, prev1) in exact ppm, AND — from the same
    matrix, over the same conditioning population — the marginalized
    first-order P(next | prev1), so every row carries its own
    first-vs-second-order A/B: `memory_ppm` = p2 - p1 is the exact
    sequence-memory signal (how much the extra history step moves the
    prediction), the way jm_bigram_lm_topk A/Bs sequence-aware ranking
    against lm_dirichlet's unigram on identical inputs. Rows with
    |memory_ppm| far from 0 are exactly where a first-order model
    mispredicts — the model-order selection evidence (the chi-square /
    likelihood-ratio test's sufficient statistics are these counts).

    The first-order terms marginalize the TRIGRAM matrix (sum over
    prev2) rather than re-counting bigrams, so both estimates
    condition on the identical event population (rows with 2+ events
    of history) — an apples-to-apples A/B that one extra window over
    the KB matrix buys; re-counting would include each user's first
    transition in one estimate but not the other.

    Scale shape (the event_transition_matrix discipline): one events
    scan through ONE per-user ordered window computing both lags (two
    lag() calls over the same window spec share one sort/exchange),
    then the fact stream collapses to the |types|^3 count matrix (KB
    at any corpus); the three marginal sums are partition windows over
    THAT matrix — no second fact scan, no self-join (the totals
    self-join the plan baseline caught in the first-order row's
    development is structurally avoided here the same way).

    Determinism: the lag ordering is total per user (ts, then unique
    event_id); counts are exact BIGINTs; ppm quantization is
    positive-integer floor division (Spark div == DuckDB // on
    non-negative operands), and memory_ppm subtracts the two already-
    quantized integers — no float anywhere."""
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    tr = (
        seq.where(F.col("prev2").isNotNull())
        .groupBy("prev2", "prev1", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w2 = Window.partitionBy("prev2", "prev1")
    w1n = Window.partitionBy("prev1", "next_type")
    w1 = Window.partitionBy("prev1")
    return (
        tr.select(
            "prev2",
            "prev1",
            "next_type",
            "n_trans",
            F.sum("n_trans").over(w2).cast("long").alias("n_from"),
            F.sum("n_trans").over(w1n).cast("long").alias("n1_trans"),
            F.sum("n_trans").over(w1).cast("long").alias("n1_from"),
        )
        .select(
            "prev2",
            "prev1",
            "next_type",
            "n_trans",
            "n_from",
            F.expr("(n_trans * 1000000) div n_from").alias("p2_ppm"),
            F.expr("(n1_trans * 1000000) div n1_from").alias("p1_ppm"),
            F.expr(
                "(n_trans * 1000000) div n_from"
                " - (n1_trans * 1000000) div n1_from"
            ).alias("memory_ppm"),
        )
        .orderBy("prev2", "prev1", "next_type")
    )


_PATH_PREFIX = 5  # path = first 5 events of the session
_PATH_TOPK = 20


@register(
    "session_path_topk",
    oracle=f"""
WITH d AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         epoch(CAST(ts AS TIMESTAMP))
           - lag(epoch(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events),
 s AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0
                  END) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM d),
 r AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rn
  FROM s),
 p AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_PATH_PREFIX}
  GROUP BY 1, 2)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOPK}
""",
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent session-path mining over the 30-minute-gap sessionized
    clickstream: each session's PATH is its first 5 event types in
    order (joined with '>'), and the row reports the top-20 paths by
    session count — the sequential-pattern member of the behavioral
    family beside the funnel (ONE fixed path's conversion), the
    transition matrices (memoryless step statistics), and the
    sessionizer (the grouping itself): THIS surfaces which whole
    journeys actually dominate, the clickstream-analytics primitive
    behind navigation-design and anomaly triage (and the count stage
    of generalized sequential-pattern mining a la GSP/PrefixSpan,
    bounded to the session prefix).

    Scale shape: one events scan; the sessionize running-sum and the
    within-session row_number share the user-partitioned sort (one
    exchange family); the prefix filter (rn <= 5) bounds every
    session's contribution BEFORE aggregation, the path fold collapses
    to one row per session, and the path count collapses to the
    distinct-path frame (tiny: paths over a bounded alphabet with
    bounded length); TakeOrdered keeps the global top-20. At 100 TB
    nothing after the per-user window touches event-sized data twice.

    Determinism: session boundaries use the total (ts, event_id)
    order (the events_sessionize contract, same 1800s literal); the
    path string is assembled in rn order in both engines (Spark:
    sort-by-rn struct array fold; DuckDB: ordered string_agg —
    different syntax, identical sequence); counts are exact BIGINTs
    and the final order is total (n_sessions DESC, path)."""
    e = T(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(
        F.col("ts").cast("double")
    ).over(order)
    d = e.select("user_id", "event_id", "event_type", "ts", gap.alias("gap_s"))
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = d.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum(
            F.when(
                F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1
            ).otherwise(0)
        )
        .over(running)
        .cast("long")
        .alias("session_id"),
    )
    sess_order = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    r = s.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(sess_order).alias("rn"),
    )
    p = (
        r.where(F.col("rn") <= _PATH_PREFIX)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(rn, event_type))), x -> x.event_type)"
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOPK)
    )
