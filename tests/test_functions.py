from __future__ import annotations

from migrate_cassandra_to_mysql_spark.functions.hashing import (
    TOKEN_MAX,
    TOKEN_MIN,
    token_ranges,
)


def test_token_ranges_cover_ring_without_gaps():
    ranges = token_ranges(256)
    assert len(ranges) == 256
    assert ranges[0]["range_start"] == TOKEN_MIN
    assert ranges[-1]["range_end"] == TOKEN_MAX
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["range_end"] == cur["range_start"]  # contiguous, no gaps
    for r in ranges:
        assert r["checkpoint"] == r["range_start"]  # seeded to start


def test_sanitize_columns(spark):
    from pyspark.sql import Row

    from migrate_cassandra_to_mysql_spark.functions.sanitize import sanitize_columns

    df = spark.createDataFrame(
        [Row(name=None, size=None, modified=None), Row(name="x", size=2, modified=None)],
        "name string, size int, modified timestamp",
    )
    out = sanitize_columns(
        df, ["name"], {"modified": "2026-01-01 00:00:00"}
    ).collect()
    assert out[0]["name"] == ""  # NULL string -> ''
    assert out[0]["size"] is None  # NULL int passes through
    assert out[0]["modified"] is not None  # NULL ts -> default
    assert out[1]["name"] == "x"
