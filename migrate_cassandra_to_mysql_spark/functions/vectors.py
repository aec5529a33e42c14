"""Vector (embedding) column expressions.

Embeddings are plain ``array<float>`` columns (64-dim in the testdata).
Dot products / norms are computed with higher-order functions
(`zip_with` + `aggregate`) entirely JVM-side — sequential left-to-right
accumulation in float64, which matches DuckDB's list functions on
``DOUBLE[]`` casts closely enough that similarities agree to ~1e-12;
oracle queries round to 8 decimals before ranking to absorb that.

Scale note: brute-force top-k is a cross join — O(Q x N). It is the
correctness baseline; the IVF variant in operators/similarity.py is the
scale path (prunes N to one cell per query).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def bq_pack_sql(v: str, lo: int) -> str:
    """Spark SQL expression: BIGINT word packing bits lo..lo+31 of the
    sign pattern of array column `v` (bit i-1 set iff v[lo+i] >= 0,
    element_at 1-based). Pure integer construction off exact float
    comparisons — bit-identical cross-engine with no rounding
    discipline; 32 bits per word so bit 63 never overflows signed
    BIGINT. The DuckDB twin lives next to the bq_hamming_topk oracle
    (plans/vectorplans._bq_pack_duck)."""
    return (
        f"CAST(aggregate(transform(sequence(1, 32), i -> "
        f"CASE WHEN element_at({v}, i + {lo}) >= 0"
        f" THEN shiftleft(CAST(1 AS BIGINT), i - 1)"
        f" ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT),"
        f" (a, x) -> a + x) AS BIGINT)"
    )
