"""Bucketed time-range join — the scalable form of interval joins.

`right.ts in [left.ts, left.ts + window)` with no equi key is a theta
join: Catalyst's only native strategies are broadcast-nested-loop (dies
when neither side broadcasts) or a full sort-merge range. The scalable
pattern buckets time into window-sized cells: a right row in
[left.ts, left.ts + W) must live in the left row's cell or the next one,
so probing 2 cells per left row turns the theta join into an equi-join on
cell id + a cheap refine filter — shuffle is hash-by-cell, work is
O(matches), not O(N*M).

Epoch math is done in double seconds (identical in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (left row, right row) with right_ts in [left_ts, left_ts + W).

    Column collisions are the caller's responsibility (select/alias before
    joining). Returns all columns of both inputs.
    """
    w = float(window_seconds)
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")

    l2 = left.withColumn(
        "__cell", F.explode(F.array(F.floor(lsec / w), F.floor(lsec / w) + 1))
    )
    r2 = right.withColumn("__cell", F.floor(rsec / w))
    joined = l2.join(r2, "__cell")
    refined = joined.where(
        (F.col(right_ts).cast("double") >= F.col(left_ts).cast("double"))
        & (F.col(right_ts).cast("double") < F.col(left_ts).cast("double") + w)
    )
    return refined.drop("__cell")
