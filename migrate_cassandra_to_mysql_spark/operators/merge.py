"""Snapshot merge (CDC-style upsert) in pure DataFrame ops.

The reference refreshes a destination by re-running the full snapshot with
INSERT IGNORE (`snapshot_use_pyspark.py:455-458`) — new rows insert,
existing rows keep their first-arrived value. A real sync pipeline needs
the other policy too: *latest wins* (upsert/merge). Both are one plan:

  union(existing tagged 0, incoming tagged 1)
    -> row_number over key ordered by (policy, tiebreak)
    -> keep rank 1

At scale this is a single hash-partition shuffle on the key — the same
cost as any key-dedup — and it composes with the idempotent JDBC sink
(sinks/idempotent.py upsert mode) for the write side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_snapshots(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    policy: str = "latest_wins",
) -> DataFrame:
    """Merge incoming rows into existing by key.

    policy='latest_wins': incoming replaces existing on key collision.
    policy='first_wins' : existing kept (INSERT IGNORE semantics).
    order_cols break ties *within* each side deterministically.
    """
    if policy not in ("latest_wins", "first_wins"):
        raise ValueError(policy)
    pref = 0 if policy == "latest_wins" else 1
    a = existing.withColumn("__src", F.lit(1 - pref))
    b = incoming.withColumn("__src", F.lit(pref))
    w = Window.partitionBy(*key_cols).orderBy(
        "__src", *[F.col(c) for c in order_cols]
    )
    return (
        a.unionByName(b)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
