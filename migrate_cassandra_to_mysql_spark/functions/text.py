"""Shared text column expressions.

Only the primitives used across modules live here; the dedup family
(shingles, MinHash) lives in operators/dedup.py where its scale notes
apply, and per-document stats expressions in operators/textops.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization.

    DuckDB twin: ``string_split_regex(trim(text), '\\s+')``.
    """
    return F.split(F.trim(text), r"\s+")


def normalized(text: Column) -> Column:
    """Lowercased, whitespace-collapsed canonical form (fingerprint input).

    DuckDB twin: ``regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')``.
    """
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def char_ngrams_expr(text_col_name: str, n: int = 3) -> Column:
    """Distinct character n-grams (column start positions need SQL expr).

    DuckDB twin::

        list_distinct(list_transform(
            range(1, greatest(length(text) - {n} + 2, 1)),
            i -> substring(text, i, {n})))
    """
    return F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col_name}) - {n} + 1, 0)),"
        f" i -> substring({text_col_name}, i, {n})))"
    )
