"""Cassandra source via the Spark Cassandra Connector (DataSource V2).

Replaces the reference's hand-rolled token-range scan machinery — the
256-range splitter, per-range CQL with token() predicates, fetch_size
paging, and ConsistencyLevel.ONE (`snapshot_use_pyspark.py:107-137,
216-224`) — with the connector's native input splits: it partitions by
token ranges internally (size-aware via system.size_estimates), pushes
token-range and partition-key predicates server-side, and handles paging.

The connector jar is not present in this environment, so `read_table` is
import-gated; `connector_options` is pure and unit-tested, and is the
single place the reference's tuning knobs map onto connector config.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


@dataclass(frozen=True)
class CassandraScanConfig:
    """Scan tuning, mirroring the reference's knobs (SURVEY §6)."""

    hosts: str = "localhost"
    port: int = 9042
    consistency: str = "ONE"  # snapshot_use_pyspark.py:224
    fetch_rows: int = 2000  # SimpleStatement fetch_size (ibid.)
    split_size_mb: int = 64  # replaces the fixed 256-range split
    username: str | None = None
    password: str | None = None


def connector_options(
    keyspace: str, table: str, cfg: CassandraScanConfig
) -> dict[str, str]:
    opts = {
        "keyspace": keyspace,
        "table": table,
        "spark.cassandra.connection.host": cfg.hosts,
        "spark.cassandra.connection.port": str(cfg.port),
        "spark.cassandra.input.consistency.level": cfg.consistency,
        "spark.cassandra.input.fetch.sizeInRows": str(cfg.fetch_rows),
        "spark.cassandra.input.split.sizeInMB": str(cfg.split_size_mb),
    }
    if cfg.username:
        opts["spark.cassandra.auth.username"] = cfg.username
    if cfg.password:
        opts["spark.cassandra.auth.password"] = cfg.password
    return opts


def read_table(
    spark: SparkSession, keyspace: str, table: str, cfg: CassandraScanConfig
) -> DataFrame:
    """Token-range-partitioned scan as a DataFrame. Predicates/projections
    composed on the result are pushed down by the connector (DS V2), so
    `df.select(cols).filter(pk == x)` reaches Cassandra as a bounded CQL
    query — what the reference built by hand per range."""
    return (
        spark.read.format(CASSANDRA_FORMAT)
        .options(**connector_options(keyspace, table, cfg))
        .load()
    )
