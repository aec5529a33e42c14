"""NULL-sanitization column rules.

Re-expresses the reference's per-row sanitize closure
(`snapshot_use_pyspark.py:241-255`): NULL -> '' for designated string
columns, pass-through NULL for numeric columns, NULL -> default timestamp
for designated timestamp columns. In the reference this is a row-at-a-time
Python loop; here it is pure `coalesce` column expressions that stay inside
whole-stage codegen — no UDF, no Python in the hot path.

Note the reference uses ``datetime.now()`` as the timestamp default
(`snapshot_use_pyspark.py:252-253`); this engine takes an explicit default
so pipelines are deterministic/replayable (a requirement for idempotent
retry at scale — a task rerun must produce identical rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sanitize_columns(
    df: DataFrame,
    empty_string_cols: list[str] | None = None,
    ts_default_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Apply the NULL contract: '' for strings, fixed literal for timestamps.

    Numeric columns are intentionally untouched (pass-through NULL), matching
    the int branch at `snapshot_use_pyspark.py:248-251`.
    """
    exprs = []
    ts_default_cols = ts_default_cols or {}
    empty = set(empty_string_cols or [])
    for field in df.schema.fields:
        c = field.name
        if c in empty:
            exprs.append(F.coalesce(F.col(c), F.lit("")).alias(c))
        elif c in ts_default_cols:
            exprs.append(
                F.coalesce(
                    F.col(c), F.lit(ts_default_cols[c]).cast("timestamp")
                ).alias(c)
            )
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)
