"""Python DataSource V2 relational source: full roundtrip, range
partitioning, and predicate pushdown (unit + end-to-end)."""

from __future__ import annotations

import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNotNull,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.sources.pydatasource import (
    FORMAT_NAME,
    SQLiteDataSource,
    SQLiteReader,
    register,
)


@pytest.fixture(scope="module")
def orders_db(spark, sf_dir):
    """The orders table staged into a sqlite file (timestamps as ISO
    strings — sqlite has no timestamp type)."""
    db = f"{tempfile.mkdtemp()}/orders.db"
    rows = (
        T(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .collect()
    )
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY,"
            " o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE,"
            " o_orderdate VARCHAR)"
        )
        conn.executemany(
            "INSERT INTO orders VALUES (?,?,?,?,?)", [tuple(r) for r in rows]
        )
    register(spark)
    return db


def _read(spark, db, **opts):
    r = spark.read.format(FORMAT_NAME).option("path", db).option("table", "orders")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_roundtrip_and_schema(spark, sf_dir, orders_db):
    df = _read(spark, orders_db)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "bigint", "string", "double", "string",
    ]
    want = T(spark, sf_dir, "orders").count()
    assert df.count() == want
    # Value spot-check against the parquet original.
    got = {r["o_orderkey"]: r["o_totalprice"] for r in df.collect()}
    src = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in T(spark, sf_dir, "orders").collect()
    }
    assert got == src


def test_range_partitioning_complete_and_parallel(spark, orders_db):
    df = _read(
        spark, orders_db, partitionColumn="o_orderkey", numPartitions=8
    )
    assert df.rdd.getNumPartitions() == 8
    sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sum(sizes) == _read(spark, orders_db).count()  # complete, disjoint
    assert sum(1 for s in sizes if s > 0) >= 4  # actually spread out


def test_pushdown_unit_supported_and_residual():
    reader = SQLiteReader.__new__(SQLiteReader)
    reader.where_terms = []
    residual = list(
        reader.pushFilters(
            [
                EqualTo(("o_orderstatus",), "O"),
                GreaterThan(("o_totalprice",), 1000.5),
                In(("o_custkey",), (1, 2, 3)),
                IsNotNull(("o_orderdate",)),
                StringStartsWith(("o_orderstatus",), "100%_x"),
                EqualTo(("nested", "field"), 1),  # unsupported: nested
            ]
        )
    )
    assert reader.where_terms == [
        "\"o_orderstatus\" = 'O'",
        '"o_totalprice" > 1000.5',
        '"o_custkey" IN (1, 2, 3)',
        '"o_orderdate" IS NOT NULL',
        "\"o_orderstatus\" LIKE '100\\%\\_x%' ESCAPE '\\'",
    ]
    # The nested-column filter is returned for Spark to evaluate.
    assert residual == [EqualTo(("nested", "field"), 1)]


def test_pushdown_end_to_end_matches_parquet(spark, sf_dir, orders_db):
    """Filters + partitioning together: the pushed WHERE must not drop or
    duplicate rows vs the same query on parquet."""
    df = _read(
        spark, orders_db, partitionColumn="o_orderkey", numPartitions=4
    ).where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
    src = (
        T(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
    )
    assert df.count() == src.count() > 0
    got = sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())
    want = sorted(r["o_orderkey"] for r in src.select("o_orderkey").collect())
    assert got == want


def test_quoted_string_literal_does_not_break_sql(spark, orders_db):
    df = _read(spark, orders_db).where(F.col("o_orderstatus") == "O'Brien")
    assert df.count() == 0  # no match, but no SQL error either


def test_schema_error_on_missing_table(orders_db):
    src = SQLiteDataSource({"path": orders_db, "table": "nope"})
    with pytest.raises(ValueError, match="no such table"):
        src.schema()
    assert isinstance(
        SQLiteDataSource({"path": orders_db, "table": "orders"}).schema(),
        StructType,
    )


def test_sql_literal_declines_unrepresentable_types():
    import datetime

    from migrate_cassandra_to_mysql_spark.sources.pydatasource import (
        _sql_literal,
    )

    assert _sql_literal("o'brien") == "'o''brien'"
    assert _sql_literal(True) == "1"
    assert _sql_literal(42) == "42"
    assert _sql_literal(1.5) == "1.5"
    assert _sql_literal(datetime.date(2024, 1, 1)) is None
    assert _sql_literal(b"raw") is None


def test_filter_to_sql_declines_on_bad_literals():
    from pyspark.sql.datasource import EqualTo, In

    from migrate_cassandra_to_mysql_spark.sources.pydatasource import (
        _filter_to_sql,
    )
    import datetime

    assert _filter_to_sql(EqualTo(("c",), datetime.date(2024, 1, 1))) is None
    assert _filter_to_sql(In(("c",), (1, datetime.date(2024, 1, 1)))) is None
    assert _filter_to_sql(EqualTo(("c",), 7)) == '"c" = 7'
