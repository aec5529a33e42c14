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


# --- PII scrubbing -----------------------------------------------------------
# Patterns are kept to the syntax subset shared by Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b word boundaries.
# No lookarounds, no backreferences — those diverge across engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}

# Redaction order matters: emails before IPv4 (a dotted hostname tail could
# otherwise be half-eaten), IPv4 before phone (both are digit runs).
_PII_ORDER = ("email", "ipv4", "phone")


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (BIGINT, counted before redaction).

    DuckDB twin: ``CAST(len(regexp_extract_all(text, '<pat>')) AS BIGINT)``.
    """
    pat, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")


def pii_redact(text: Column) -> Column:
    """All known PII kinds replaced by typed placeholder tokens.

    Pure regexp_replace chain — JVM codegen, no UDF, safe in the 100 TB hot
    path. DuckDB twin: the same chain with ``regexp_replace(..., 'g')``
    applied in _PII_ORDER.
    """
    out = text
    for kind in _PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out
