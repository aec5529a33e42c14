"""As-of and range join edge semantics."""

from __future__ import annotations

from migrate_cassandra_to_mysql_spark.operators.asof import asof_join
from migrate_cassandra_to_mysql_spark.operators.rangejoin import time_range_join


def test_asof_inclusive_tie_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00"), (1, 101, "2024-01-01 09:00:00"),
         (2, 200, "2024-01-01 10:00:00")],
        "k long, lid long, lts string",
    ).selectExpr("k", "lid", "CAST(lts AS TIMESTAMP) AS lts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0), (1, "2024-01-01 08:00:00", 3.0)],
        "k long, rts string, val double",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "val")
    out = {
        r["lid"]: r["val_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["rts", "val"],
        ).collect()
    }
    assert out[100] == 5.0  # tie at equal ts -> inclusive match
    assert out[101] == 3.0  # earlier left row sees only the earlier right
    assert out[200] is None  # key with no right rows -> NULL, row kept


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "lid long, lts string"
    ).selectExpr("lid", "CAST(lts AS TIMESTAMP) AS lts")
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 10:00:00"),  # == start: in
            (11, "2024-01-01 10:04:59"),  # inside: in
            (12, "2024-01-01 10:05:00"),  # == end: out (half-open)
            (13, "2024-01-01 09:59:59"),  # before: out
            (14, "2024-01-01 10:07:30"),  # next cell, outside window: out
        ],
        "rid long, rts string",
    ).selectExpr("rid", "CAST(rts AS TIMESTAMP) AS rts")
    got = {
        r["rid"]
        for r in time_range_join(left, right, "lts", "rts", 300).collect()
    }
    assert got == {10, 11}


def test_range_join_crosses_cell_boundary(spark):
    """A match in the NEXT time cell must be found (the 2-probe explode)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:04:00")], "lid long, lts string"
    ).selectExpr("lid", "CAST(lts AS TIMESTAMP) AS lts")
    right = spark.createDataFrame(
        [(20, "2024-01-01 10:06:00")], "rid long, rts string"
    ).selectExpr("rid", "CAST(rts AS TIMESTAMP) AS rts")
    got = {
        r["rid"]
        for r in time_range_join(left, right, "lts", "rts", 300).collect()
    }
    assert got == {20}
