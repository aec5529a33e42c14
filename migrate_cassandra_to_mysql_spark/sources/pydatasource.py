"""Relational read path as a Python DataSource V2 ("pyrelational").

The reference's read side is a hand-rolled parallel relational scan:
split the Murmur3 ring into 256 token ranges, issue one bounded SELECT
per range, push the range predicate into the query
(`snapshot_use_pyspark.py:107-137,216-224`). This module re-derives that
design on Spark 4's Python DataSource API, which exposes exactly the
three hooks the reference built by hand:

  - ``partitions()``  -> key-range splits (the token-range splitter)
  - ``pushFilters()`` -> predicate pushdown into the per-split SELECT
  - ``read(part)``    -> one bounded query per split, executor-side

It reads any SQLite database (the one embedded relational engine in this
environment), making the full scan->pushdown->partition pipeline
testable end-to-end with zero external services; the same class shape
ports to any DB-API driver by swapping `_connect`. In production the
JVM JDBC/Cassandra connectors (sources/jdbc.py, sources/cassandra.py)
remain the fast path; this is the extension point for sources with no
JVM connector.

Scale notes: splits are computed once on the driver from min/max of the
partition column (two indexed lookups); each executor task opens its own
connection and streams one split with the pushed WHERE clause, so no
row ever moves that the sink-side plan filtered out. Unsupported
filters are returned to Spark and re-evaluated post-scan — pushdown is
an optimization, never a correctness dependency.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMAT_NAME = "pyrelational"


def _connect(path: str):
    import sqlite3

    return sqlite3.connect(path)


def _affinity(decl: str):
    d = (decl or "").upper()
    if "INT" in d:
        return LongType()
    if any(t in d for t in ("REAL", "FLOA", "DOUB")):
        return DoubleType()
    return StringType()


@dataclass
class _RangeSplit(InputPartition):
    lo: int | None  # None = unbounded (first/last split)
    hi: int | None


def _sql_literal(value) -> str | None:
    """Render a pushed-filter literal as SQL, or None when the type has no
    safe textual form (datetime/date/bytes/Decimal would render via repr()
    as invalid SQL and fail the executor query — declining pushdown keeps
    Spark evaluating the filter post-scan instead)."""
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(value, bool):
        return "1" if value else "0"
    if isinstance(value, (int, float)):
        return repr(value)
    return None


def _filter_to_sql(f: Filter) -> str | None:
    """Translate one Spark filter into a WHERE term, or None if this
    source cannot push it (nested columns, unknown filter types)."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested field or attribute-less filter
    col = f'"{attr[0]}"'
    _CMP = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    for ftype, op in _CMP.items():
        if isinstance(f, ftype):
            lit = _sql_literal(f.value)
            return None if lit is None else f"{col} {op} {lit}"
    if isinstance(f, In):
        lits = [_sql_literal(v) for v in f.value]
        if any(l is None for l in lits) or not lits:
            return None
        return f"{col} IN ({', '.join(lits)})"
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, StringStartsWith):
        # LIKE with escaped wildcards, anchored at the start.
        pat = f.value.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        return f"{col} LIKE '{pat}%' ESCAPE '\\'"
    return None


class SQLiteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.table = options["table"]
        self.partition_column = options.get("partitioncolumn")
        self.num_partitions = int(options.get("numpartitions", "1"))
        self.columns = [f.name for f in schema.fields]
        self.where_terms: list[str] = []

    # -- predicate pushdown -------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            term = _filter_to_sql(f)
            if term is None:
                yield f  # unsupported: Spark re-evaluates it post-scan
            else:
                self.where_terms.append(term)

    # -- range splitting (the reference's token-range splitter) -------------
    def partitions(self) -> Sequence[_RangeSplit]:
        if self.partition_column is None or self.num_partitions <= 1:
            return [_RangeSplit(None, None)]
        conn = _connect(self.path)
        try:
            lo, hi = conn.execute(
                f'SELECT min("{self.partition_column}"),'
                f' max("{self.partition_column}") FROM "{self.table}"'
            ).fetchone()
        finally:
            conn.close()
        if lo is None or hi is None or lo == hi:
            return [_RangeSplit(None, None)]
        if not isinstance(lo, int) or not isinstance(hi, int):
            # TEXT/REAL partition column: range splitting needs integral
            # bounds; fall back to a single full scan rather than crash.
            return [_RangeSplit(None, None)]
        n = self.num_partitions
        step = max(1, (int(hi) - int(lo) + 1) // n)
        bounds = [int(lo) + i * step for i in range(1, n)]
        splits = [_RangeSplit(None, bounds[0])]
        splits += [_RangeSplit(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        splits.append(_RangeSplit(bounds[-1], None))
        return splits

    # -- per-split bounded scan ---------------------------------------------
    def read(self, partition: _RangeSplit) -> Iterator[tuple]:
        terms = list(self.where_terms)
        pc = f'"{self.partition_column}"' if self.partition_column else None
        if partition.lo is not None:
            terms.append(f"{pc} >= {partition.lo}")
        if partition.hi is not None:
            # NULL partition keys ride in the first (unbounded-lo) split.
            null_arm = f" OR {pc} IS NULL" if partition.lo is None else ""
            terms.append(f"({pc} < {partition.hi}{null_arm})")
        collist = ", ".join(f'"{c}"' for c in self.columns)
        sql = f'SELECT {collist} FROM "{self.table}"'
        if terms:
            sql += " WHERE " + " AND ".join(terms)
        conn = _connect(self.path)
        try:
            yield from conn.execute(sql)
        finally:
            conn.close()


class SQLiteDataSource(DataSource):
    """spark.read.format("pyrelational")
        .option("path", db).option("table", t)
        .option("partitionColumn", key).option("numPartitions", 8)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        conn = _connect(self.options["path"])
        try:
            info = conn.execute(
                f"PRAGMA table_info(\"{self.options['table']}\")"
            ).fetchall()
        finally:
            conn.close()
        if not info:
            raise ValueError(f"no such table: {self.options['table']}")
        return StructType(
            [StructField(row[1], _affinity(row[2]), True) for row in info]
        )

    def reader(self, schema: StructType) -> SQLiteReader:
        return SQLiteReader(schema, dict(self.options))


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (Spark 4.1); without it the
    # reader's pushFilters() raises at plan time. Dynamic conf, so setting
    # it on a live session works.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SQLiteDataSource)
