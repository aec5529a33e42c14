"""Skew-aware join: salting for hot keys.

At 100 TB a handful of hot keys (one giant customer, one default value)
can put an entire shuffle partition on one executor. AQE's skew-join
splitting (enabled in session.py) handles sort-merge cases at runtime;
this operator is the *explicit* form for when the skew is known and the
build side must be replicated: the hot side's keys get a random-ish salt
in [0, n_salts), the other side is exploded n_salts times, and the join
key becomes (key, salt). Results are identical to the unsalted join; only
the shuffle distribution changes.

Two modes: hot_keys=None salts every row and replicates the whole build
side (simple, fine when `other` is modest); hot_keys=[...] salts ONLY the
listed keys — the form that survives 100 TB, where the build side can be
a fact table itself and whole-side replication is off the table.

Salt derivation is deterministic (hash of the full row via a stable column)
rather than rand() — deterministic tasks are a requirement for Spark task
retry + the engine's idempotent-write contract (a retried task must
produce the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Join types for which salting preserves semantics. The `other` side is
# replicated n_salts times, so any join that can null-extend or emit
# unmatched `other` rows (right/full outer) would surface each unmatched
# replicated row n_salts times — silently wrong. Semi/anti joins and
# inner/left only ever emit `skewed`-side rows, which are never replicated.
_SALTABLE_JOINS = frozenset(
    {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
     "left_semi", "anti", "leftanti", "left_anti"}
)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Join `skewed` (hot-key side) to `other`, spreading each hot key over
    n_salts shuffle partitions.

    hot_keys: the known-skewed key values (from prior stats, AQE skew
    reports, or a sampled count). When given, ONLY rows with those keys are
    salted and only those keys' `other` rows are replicated n_salts times —
    cold keys join untouched with salt 0. At 100 TB this is the only viable
    form: replicating the entire build side n_salts times (hot_keys=None)
    multiplies the shuffle by n_salts, while hot-key-only salting adds
    |hot_keys| * n_salts rows total. Results are identical either way.

    salt_source: a column of `skewed` with per-row variation (defaults to
    xxhash of all columns; any varying column works — its exact
    distribution only affects balance, never results).

    how: restricted to joins whose output contains only `skewed`-side /
    matched rows (inner, left, semi, anti). right/full outer would emit
    each unmatched replicated `other` row n_salts times — a silent
    correctness bug, so they raise instead.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE_JOINS
    }:
        raise ValueError(
            f"salted_join cannot preserve '{how}' semantics: the replicated "
            "side would duplicate unmatched rows; use inner/left/semi/anti "
            "or AQE skew-join handling for outer joins"
        )
    src = F.col(salt_source) if salt_source else F.xxhash64(*skewed.columns)
    salt = F.pmod(F.xxhash64(src), F.lit(n_salts))
    if hot_keys is None:
        a = skewed.withColumn("__salt", salt)
        b = other.withColumn(
            "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
        )
    else:
        # Literal IN-list: Catalyst folds it to a hash-set probe on both
        # sides (no extra join, no broadcast needed for a handful of keys).
        hot = F.array([F.lit(k) for k in hot_keys])
        a = skewed.withColumn(
            "__salt",
            F.when(F.array_contains(hot, F.col(skewed_key)), salt).otherwise(
                F.lit(0)
            ),
        )
        b = other.withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.array_contains(hot, F.col(other_key)),
                    F.expr(f"sequence(0, {n_salts - 1})"),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    joined = a.join(
        b,
        (a[skewed_key] == b[other_key]) & (a["__salt"] == b["__salt"]),
        how,
    )
    return joined.drop("__salt")
