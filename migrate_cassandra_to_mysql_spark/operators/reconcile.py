"""Verification suite: count reconciliation + missing-key anti-join.

Re-expresses the reference's operational correctness checks as DataFrame
plans:
  - `validate_counts` (`snapshot_use_pyspark.py:372-404`): source count vs
    destination count -> diff -> OK/MISMATCH verdict row.
  - `find_missing_ids.py:38-53`: collect source ids into a Python set and
    probe the destination per id — an O(N) driver-side loop. Here it is a
    left-anti join, fully distributed, no driver collect.
  - per-range counts (`snapshot_use_pyspark.py:275-277,363-366`): groupBy
    over the token bucket instead of 256 separate CQL count queries.

Scale notes: the anti-join shuffles both sides by key (sort-merge); when the
destination side is dimension-sized, Catalyst broadcasts it automatically
under AQE. Counts are partial-aggregated map-side by Catalyst — the
reference hand-built exactly this with mapPartitions+reduce
(`snapshot_use_pyspark.py:346-370,389`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_reconciliation(
    source: DataFrame, target: DataFrame, table_name: str
) -> DataFrame:
    """One-row verdict: (table_name, source_count, target_count, diff, status)."""
    s = source.agg(F.count(F.lit(1)).alias("source_count"))
    t = target.agg(F.count(F.lit(1)).alias("target_count"))
    return (
        s.crossJoin(t)
        .withColumn("diff", F.abs(F.col("source_count") - F.col("target_count")))
        .withColumn(
            "status",
            F.when(F.col("diff") == 0, F.lit("OK")).otherwise(F.lit("MISMATCH")),
        )
        .select(
            F.lit(table_name).alias("table_name"),
            "source_count",
            "target_count",
            "diff",
            "status",
        )
    )


def missing_keys(
    source: DataFrame, target: DataFrame, source_key: str, target_key: str
) -> DataFrame:
    """Rows of `source` whose key is absent from `target` (left anti join)."""
    return source.join(
        target, on=source[source_key] == target[target_key], how="left_anti"
    )


def per_bucket_counts(df: DataFrame, bucket_col: str, key_col: str) -> DataFrame:
    """Per-token-range counts + key bounds (A1/A5 in SURVEY §2)."""
    return df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
        F.countDistinct(key_col).alias("n_keys"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style diff of two keyed snapshots: one row per changed key with
    change_type in {insert, delete, update} (unchanged keys are dropped).

    The reference migrates one frozen snapshot; an operational migration
    re-runs, and re-running needs exactly this: which keys appeared,
    vanished, or changed since the last pass, so only the delta is
    re-written (the idempotent sink then makes applying the delta safe).

    Output columns: keys, change_type, then old_<c>/new_<c> for every
    compared column.

    Scale shape: ONE full-outer sort-merge join co-partitioned on the
    snapshot key — both sides shuffle once, no driver materialization,
    no row hashing (column-wise null-safe equality keeps the comparison
    engine-portable; a hash compare would tie the diff to one engine's
    hash). At 100 TB, bucketing both snapshots on the key turns the
    shuffle into a zero-exchange zip (see tests/test_bucketing.py for the
    asserted zero-Exchange variant of this join shape).
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = o[f"_ok_{k}"] == n[f"_nk_{k}"]
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    same = None
    for c in compare_cols:
        e = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = e if same is None else (same & e)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
