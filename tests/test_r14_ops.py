"""Round-14 operator tests.

Covers the r13 ADVICE hardening (Theil-Sen / CUSUM DECIMAL(38,0)
overflow folds, the JM OOV-bigram guard) and the round's new
operators, each with a pure-Python third-engine reference where the
semantics allow.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Theil-Sen DECIMAL(38,0) slope fold (r13 ADVICE #1)
# ---------------------------------------------------------------------------


def test_ts_slope_exact_where_old_bigint_product_wrapped(spark):
    """dy * 1e6 past 2^63 silently wrapped in the old BIGINT form; the
    DECIMAL(38,0) split identity must return the EXACT floor quotient
    whenever the quotient itself fits int64 — in BOTH engines."""
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _TS_SLOPE_SQL,
    )

    cases = [
        # (dy, d): dy*1e6 overflows int64, floor(dy*1e6/d) fits.
        (55_000_000_000_000, 6),
        (-55_000_000_000_000, 6),  # negative: floor, not truncate
        (9_223_372_036_854, 1),  # just under the output bound at d=1
        (13_835_058_055_282, 2),
        (7, 3),  # tiny sanity row (old path agreed here)
        (-7, 3),
    ]
    expected = [dy * 10**6 // d for dy, d in cases]

    sdf = spark.createDataFrame(cases, "dy long, d long").select(
        F.expr(_TS_SLOPE_SQL.format(fd="div")).alias("s")
    )
    got_spark = [r["s"] for r in sdf.collect()]
    assert got_spark == expected

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT "
            + _TS_SLOPE_SQL.format(fd="//")
            + f" FROM (SELECT CAST({dy} AS BIGINT) dy,"
            f" CAST({d} AS BIGINT) d)"
        ).fetchone()[0]
        for dy, d in cases
    ]
    assert got_duck == expected


def test_ts_slope_overflow_is_loud_not_wrapped(spark):
    """Past the BIGINT output bound the row must fail LOUDLY in BOTH
    engines: Spark 4's ANSI-default DECIMAL(38,0)->BIGINT cast raises
    CAST_OVERFLOW, DuckDB raises a conversion error — never a silently
    wrapped value (the old raw-BIGINT product wrapped without a
    sound)."""
    from pyspark.errors.exceptions.captured import ArithmeticException

    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _TS_SLOPE_SQL,
    )

    dy, d = 10_000_000_000_000, 1  # slope = 1e19 > 2^63
    with pytest.raises(ArithmeticException, match="CAST_OVERFLOW"):
        spark.createDataFrame([(dy, d)], "dy long, d long").select(
            F.expr(_TS_SLOPE_SQL.format(fd="div")).alias("s")
        ).collect()

    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.execute(
            "SELECT "
            + _TS_SLOPE_SQL.format(fd="//")
            + f" FROM (SELECT CAST({dy} AS BIGINT) dy,"
            f" CAST({d} AS BIGINT) d)"
        ).fetchone()


def test_cusum_scaled_exact_past_2_53(spark):
    """n*p - t*s folds through DECIMAL(38,0): products past 2^53 (where
    a double fallback would round) and past 2^63 (where raw BIGINT
    wrapped) stay exact as long as the DIFFERENCE fits int64."""
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _CUSUM_SCALED_SQL,
    )

    # n*p and t*s each ~1.2e19 (> 2^63); difference is small and exact.
    n, p, t, s = 1_200_000_000, 10_000_000_017, 1_200_000_000, 10_000_000_000
    expected = n * p - t * s  # = 1.2e9 * 17 = 20_400_000_000
    row = (
        spark.createDataFrame(
            [(n, p, t, s)], "n long, p long, t long, s long"
        )
        .select(F.expr(_CUSUM_SCALED_SQL).alias("c"))
        .collect()[0]
    )
    assert row["c"] == expected

    con = duckdb.connect()
    got = con.execute(
        "SELECT "
        + _CUSUM_SCALED_SQL
        + f" FROM (SELECT CAST({n} AS BIGINT) n, CAST({p} AS BIGINT) p,"
        f" CAST({t} AS BIGINT) t, CAST({s} AS BIGINT) s)"
    ).fetchone()[0]
    assert got == expected


# ---------------------------------------------------------------------------
# JM bigram OOV guard (r13 ADVICE #4)
# ---------------------------------------------------------------------------


def test_jm_score_skips_zero_support_bigram(spark):
    """A query bigram with cf = 0 (no corpus support) contributes
    exactly 0.0 instead of ln(0)/0-by-0 — identical in both engines,
    so the invariant is structural, not an assumption about the
    query list."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _JM_BIGRAMS,
        _jm_score_sql,
    )

    import math

    n = len(_JM_BIGRAMS)
    # Bigram 0 supported (tf=2 of pc=4 doc-side, cf=10/cpf=40 corpus);
    # all other bigrams have zero corpus support (cf=0, cpf=0).
    vals = {"tf0": 2, "pc0": 4, "cf0": 10, "cpf0": 40}
    for i in range(1, n):
        vals.update({f"tf{i}": 0, f"pc{i}": 0, f"cf{i}": 0, f"cpf{i}": 0})
    cols = ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in vals.items())

    expected = round(math.log(0.7 * (2 / 4) + 0.3 * (10 / 40)), 8)

    got_spark = (
        spark.sql(f"SELECT {_jm_score_sql()} AS jm FROM (SELECT {cols})")
        .collect()[0]["jm"]
    )
    assert got_spark == pytest.approx(expected, abs=0)

    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT {_jm_score_sql()} AS jm FROM (SELECT {cols})"
    ).fetchone()[0]
    assert got_duck == got_spark
