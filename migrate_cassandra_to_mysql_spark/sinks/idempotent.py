"""Idempotent batched relational sink with deadlock retry.

Re-expresses the reference's write path as a reusable Spark sink:
  - batched INSERT IGNORE (`snapshot_use_pyspark.py:260-271,455-458` with
    batch_size 5000 and the uk_file_id unique key providing dedup-on-write)
  - deadlock retry, 5 attempts with 0.5*2^n backoff on MySQL errno
    1213/1205 (`snapshot_use_pyspark.py:293-340`)
  - WAL bracketing: per-batch STARTED then COMMITTED rows
    (`snapshot_use_pyspark.py:305-320`)
  - READ COMMITTED isolation (`snapshot_use_pyspark.py:206`)

Design: Spark's JDBC writer is at-least-once under task retry; exactly-once-
per-key comes from key-idempotent SQL (INSERT IGNORE / upsert) so retries
are harmless. The sink runs in `foreachPartition` — one connection per
partition, batches of `batch_size`, mirroring the reference's connection
amortization (`snapshot_use_pyspark.py:194-208`).

The DB driver is injected (`connection_factory`) because neither MySQL nor
a JDBC driver jar ships in this environment; tests drive the full sink
against sqlite3 via the SQLite dialect, and the MySQL dialect is exercised
at the SQL-text level.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

MYSQL_DEADLOCK_ERRNOS = (1213, 1205)


@dataclass(frozen=True)
class Dialect:
    name: str

    def insert_ignore(self, table: str, cols: list[str]) -> str:
        placeholders = ", ".join(["%s"] * len(cols))
        collist = ", ".join(cols)
        if self.name == "mysql":
            return f"INSERT IGNORE INTO {table} ({collist}) VALUES ({placeholders})"
        if self.name == "sqlite":
            qs = ", ".join(["?"] * len(cols))
            return f"INSERT OR IGNORE INTO {table} ({collist}) VALUES ({qs})"
        raise ValueError(f"unknown dialect {self.name}")

    def upsert(self, table: str, cols: list[str], key_cols: list[str]) -> str:
        collist = ", ".join(cols)
        updates = ", ".join(
            f"{c}=VALUES({c})" if self.name == "mysql" else f"{c}=excluded.{c}"
            for c in cols
            if c not in key_cols
        )
        if self.name == "mysql":
            ph = ", ".join(["%s"] * len(cols))
            return (
                f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
                f"ON DUPLICATE KEY UPDATE {updates}"
            )
        if self.name == "sqlite":
            ph = ", ".join(["?"] * len(cols))
            keys = ", ".join(key_cols)
            return (
                f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
                f"ON CONFLICT({keys}) DO UPDATE SET {updates}"
            )
        raise ValueError(f"unknown dialect {self.name}")


MYSQL = Dialect("mysql")
SQLITE = Dialect("sqlite")


def is_retryable(exc: Exception, retryable_errnos=MYSQL_DEADLOCK_ERRNOS) -> bool:
    """Deadlock/lock-wait detection: MySQL driver exceptions carry .errno;
    generic exceptions can opt in by setting one."""
    return getattr(exc, "errno", None) in retryable_errnos


def retry_with_backoff(
    fn: Callable[[], None],
    max_retries: int = 5,
    base_delay: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
    retryable: Callable[[Exception], bool] = is_retryable,
) -> int:
    """Run fn, retrying retryable failures with 0.5 * 2^n backoff.

    Returns the number of retries used. Non-retryable errors propagate
    immediately; retryable errors propagate after max_retries.
    """
    for attempt in range(max_retries + 1):
        try:
            fn()
            return attempt
        except Exception as exc:  # noqa: BLE001
            if not retryable(exc) or attempt == max_retries:
                raise
            sleep(base_delay * (2**attempt))
    raise AssertionError("unreachable")


def write_partition(
    rows: Iterator,
    connection_factory: Callable[[], object],
    table: str,
    cols: list[str],
    dialect: Dialect = MYSQL,
    key_cols: list[str] | None = None,
    batch_size: int = 5000,
    max_retries: int = 5,
    wal: bool = False,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Write one partition's rows in idempotent batches. Returns rows written.

    Per batch: optional WAL STARTED row -> executemany insert -> WAL
    COMMITTED -> commit, all on one connection, with deadlock retry around
    the whole batch (rollback before each retry, as the reference does at
    snapshot_use_pyspark.py:323-329).
    """
    conn = connection_factory()
    cur = conn.cursor()
    sql = (
        Dialect.insert_ignore(dialect, table, cols)
        if not key_cols
        else Dialect.upsert(dialect, table, cols, key_cols)
    )
    written = 0
    batch: list[tuple] = []
    batch_seq = 0

    def flush() -> None:
        def attempt() -> None:
            if wal:
                cur.execute(
                    _wal_sql(dialect, "STARTED"), (table, batch_seq, len(batch))
                )
            cur.executemany(sql, batch)
            if wal:
                cur.execute(
                    _wal_sql(dialect, "COMMITTED"), (table, batch_seq, len(batch))
                )
            conn.commit()

        def guarded() -> None:
            try:
                attempt()
            except Exception:
                conn.rollback()
                raise

        retry_with_backoff(guarded, max_retries=max_retries, sleep=sleep)

    for row in rows:
        batch.append(tuple(row[c] for c in cols))
        if len(batch) >= batch_size:
            flush()
            written += len(batch)
            batch_seq += 1
            batch = []
    if batch:
        flush()
        written += len(batch)
    cur.close()
    conn.close()
    return written


def _wal_sql(dialect: Dialect, status: str) -> str:
    ph = "%s" if dialect.name == "mysql" else "?"
    return (
        f"INSERT INTO snapshot_wal (table_name, batch_id, n_rows, status) "
        f"VALUES ({ph}, {ph}, {ph}, '{status}')"
    )


def sqlite_connection_factory(path: str):
    """Picklable sqlite connection factory for tests/local sinks. sqlite
    allows one writer; the generous busy timeout makes concurrent partitions
    queue (stand-in for MySQL row-level locking)."""
    import sqlite3

    return sqlite3.connect(path, timeout=60)


WAL_DDL = """
CREATE TABLE IF NOT EXISTS snapshot_wal (
  table_name VARCHAR(128), batch_id BIGINT, n_rows BIGINT,
  status VARCHAR(16)
)
"""


def write_idempotent(
    df: DataFrame,
    connection_factory: Callable[[], object],
    table: str,
    dialect: Dialect = MYSQL,
    key_cols: list[str] | None = None,
    batch_size: int = 5000,
    wal: bool = False,
) -> None:
    """Distributed idempotent write: foreachPartition over the DataFrame.

    connection_factory must be picklable (top-level function / partial) —
    it is shipped to executors. At 100 TB, ensure the DataFrame is
    partitioned so each partition's batch fits the sink's transaction
    budget (df.repartition(n) upstream), and rely on key-idempotent SQL +
    Spark task retry for exactly-once-per-key.
    """
    cols = df.columns

    def handle(it: Iterator) -> None:
        write_partition(
            it,
            connection_factory,
            table,
            cols,
            dialect=dialect,
            key_cols=key_cols,
            batch_size=batch_size,
            wal=wal,
        )

    df.foreachPartition(handle)
