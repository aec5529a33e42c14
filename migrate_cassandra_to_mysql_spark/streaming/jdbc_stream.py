"""Streaming -> relational sink job: foreachBatch + idempotent writes.

This is the streaming form of the reference's whole pipeline
(`snapshot_use_pyspark.py` main(): scan -> transform -> batched INSERT
IGNORE -> checkpoint). Structured Streaming supplies the checkpoint/
restart machinery; `sinks.idempotent.write_idempotent` supplies the
key-idempotent batched write; together a micro-batch that fails or is
replayed after restart converges to the same sink state.

Exactly-once contract (the same one the reference gets from uk_file_id +
INSERT IGNORE, re-derived for streams):
  - the checkpoint dir commits each micro-batch at-most-once per run;
  - a crash between sink write and checkpoint commit replays the batch,
    and the key-idempotent SQL (INSERT IGNORE / upsert) makes the replay
    a no-op per key;
  - so sink state == exactly-once per key, with no distributed
    transactions and no sink-side batch ledger required. The optional
    WAL (wal=True) adds the reference's per-batch audit brackets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from migrate_cassandra_to_mysql_spark.sinks.idempotent import (
    MYSQL,
    Dialect,
    write_idempotent,
)
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import (
    snapshot_stream,
)


def stream_to_relational(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    connection_factory: Callable[[], object],
    table: str,
    dialect: Dialect = MYSQL,
    key_cols: list[str] | None = None,
    batch_size: int = 5000,
    wal: bool = False,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    sink_partitions: int | None = None,
) -> list[int]:
    """Drain all available source files into a relational table, exactly
    once per key across restarts. Returns the batch ids processed this run
    (empty on a no-new-data restart).

    `sink_partitions` bounds sink connection fan-in: at 100 TB a micro-
    batch can span thousands of input partitions, but the relational
    sink wants tens of connections — coalesce (no shuffle) down to the
    sink's transaction budget rather than opening a connection per scan
    partition.
    """
    processed: list[int] = []

    def handle(df: DataFrame, batch_id: int) -> None:
        out = transform(df) if transform is not None else df
        if sink_partitions is not None:
            out = out.coalesce(sink_partitions)
        write_idempotent(
            out,
            connection_factory,
            table,
            dialect=dialect,
            key_cols=key_cols,
            batch_size=batch_size,
            wal=wal,
        )
        processed.append(batch_id)

    snapshot_stream(spark, source_dir, checkpoint_dir, handle)
    return processed
