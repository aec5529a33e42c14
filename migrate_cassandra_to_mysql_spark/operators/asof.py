"""As-of (temporal) join — a core time-series operator Spark lacks.

For each left row, find the most recent right row with the same key and
timestamp <= the left timestamp. Naive implementations are O(N*M) theta
joins or per-key collect loops; the scalable formulation is the
union-window trick:

  union(right tagged 1, left tagged 0)
    -> window per key ordered by (ts, tag DESC):
       running last-seen right-row payload
    -> keep left rows, now carrying the as-of match

One hash shuffle on the key (the window), zero theta joins, no state
blow-up — the same shape Flink/kdb use for as-of semantics. Ties
(left.ts == right.ts) match the right row, i.e. inclusive <=, which is
DuckDB's native ASOF JOIN semantics (the oracle for the catalog query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row per key with right_ts <= left_ts.

    Returns all left columns plus `<value_col><suffix>` for each right
    value column (NULL when no right row precedes the left row).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lt = left.withColumn("__tag", F.lit(0)).withColumn("__ets", F.col(left_ts))
    rt = right.withColumn("__tag", F.lit(1)).withColumn("__ets", F.col(right_ts))

    # Align schemas for the union: left's payload columns are NULL on the
    # right side and vice versa.
    l_cols = [c for c in left.columns if c != on]
    r_cols = value_cols
    lt2 = lt.select(
        F.col(on),
        "__tag",
        "__ets",
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_cols],
    )
    rt2 = rt.select(
        F.col(on),
        "__tag",
        "__ets",
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols],
        *[F.col(c).alias(f"__r_{c}") for c in r_cols],
    )
    u = lt2.unionByName(rt2)

    # Right rows sort BEFORE left rows at equal ts (tag DESC) => inclusive
    # <= semantics. last(..., ignorenulls) carries the latest right payload
    # forward along the per-key timeline.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ets").asc(), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        on,
        "__tag",
        "__ets",
        *[F.col(f"__l_{c}") for c in l_cols],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in r_cols
        ],
    )
    out = carried.where(F.col("__tag") == 0).select(
        F.col(on),
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *[F.col(f"__rv_{c}").alias(f"{c}{suffix}") for c in r_cols],
    )
    return out
