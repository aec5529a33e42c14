"""Skew-aware join: salting for hot keys.

At 100 TB a handful of hot keys (one giant customer, one default value)
can put an entire shuffle partition on one executor. AQE's skew-join
splitting (enabled in session.py) handles sort-merge cases at runtime;
this operator is the *explicit* form for when the skew is known and the
build side must be replicated: the hot side's keys get a random-ish salt
in [0, n_salts), the other side is exploded n_salts times, and the join
key becomes (key, salt). Results are identical to the unsalted join; only
the shuffle distribution changes.

Salt derivation is deterministic (hash of the full row via a stable column)
rather than rand() — deterministic tasks are a requirement for Spark task
retry + the engine's idempotent-write contract (a retried task must
produce the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `skewed` (hot-key side) to `other`, spreading each hot key over
    n_salts shuffle partitions.

    salt_source: a column of `skewed` with per-row variation (defaults to
    the key itself plus xxhash of all columns is overkill; any varying
    column works — its exact distribution only affects balance, never
    results).
    """
    src = F.col(salt_source) if salt_source else F.xxhash64(*skewed.columns)
    a = skewed.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(n_salts)))
    b = other.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    joined = a.join(
        b,
        (a[skewed_key] == b[other_key]) & (a["__salt"] == b["__salt"]),
        how,
    )
    return joined.drop("__salt")
