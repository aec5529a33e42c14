"""Driver-facing robustness probes (the verify-skill checklist).

The driver runs queries() in ITS OWN SparkSession with its own conf and
path conventions; these tests simulate the hostile variants: a session
whose timezone is not UTC, an sf_dir with a trailing slash, and repeated
entry() calls in one session (conf mutation must be idempotent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans import catalog
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_entry_twice_same_session_same_result(spark):
    import __spark_entry__ as e

    a = e.entry(spark)
    n1, schema1 = a.count(), a.schema
    b = e.entry(spark)
    assert b.count() == n1
    assert b.schema == schema1


def test_trailing_slash_sf_dir(spark, sf_dir):
    qs = catalog.queries()
    plain = qs["token_range_counts"](spark, sf_dir).count()
    slashed = qs["token_range_counts"](spark, sf_dir + "/").count()
    assert plain == slashed > 0


def test_non_utc_session_timezone_is_repinned(spark, sf_dir):
    """A consuming session that set its own timezone must still get
    UTC-interpreted timestamps: parquet.table re-pins UTC on every load,
    and the timestamp VALUES (epoch-anchored) must match the UTC run."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    utc_rows = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in catalog.queries()["events_sliding_windows"](
            spark, sf_dir
        ).collect()
    }
    try:
        spark.conf.set(
            "spark.sql.session.timeZone", "America/New_York"
        )
        rows = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in catalog.queries()["events_sliding_windows"](
                spark, sf_dir
            ).collect()
        }
        assert rows == utc_rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_events_loads_via_table_helper_not_raw_read(spark, sf_dir):
    """events.parquet may carry TIMESTAMP(NANOS); the table() helper must
    surface ts as a usable timestamp regardless of generation."""
    ev = T(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.where(F.col("ts").isNotNull()).count() > 0


def test_gap_fill_timezone_and_slash_robust(spark, sf_dir):
    """events_gap_fill derives hourly buckets with date_trunc — under a
    consuming session pinned to another timezone the bucket VALUES must
    still be the UTC ones (parquet.table re-pins), and a trailing slash
    must resolve."""
    q = catalog.queries()["events_gap_fill"]
    utc = {(r["user_id"], r["bucket"]) for r in q(spark, sf_dir).collect()}
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        shifted = {
            (r["user_id"], r["bucket"])
            for r in q(spark, sf_dir + "/").collect()
        }
        assert shifted == utc
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
