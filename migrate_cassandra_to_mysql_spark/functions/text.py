"""Text-analysis column expressions (tokenize, shingles, minhash).

All expressions are built-in `pyspark.sql.functions` / higher-order SQL
functions — JVM-side, codegen-friendly, no Python UDFs. Each has an exact
DuckDB-SQL twin (documented inline) so the oracle harness can verify it.

Design for 100 TB: shingling multiplies row counts ~100x; every consumer
below (dedup joins, minhash aggregation) applies `array_distinct` *before*
exploding and aggregates map-side, so shuffle volume stays proportional to
distinct shingles, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization.

    DuckDB twin: ``string_split_regex(trim(text), '\\s+')``.
    """
    return F.split(F.trim(text), r"\s+")


def word_shingles(toks: Column, k: int = 5) -> Column:
    """Distinct k-word shingles of a token array.

    DuckDB twin::

        list_distinct(list_transform(
            range(0, greatest(len(toks) - {k} + 1, 0)),
            i -> array_to_string(toks[i+1:i+{k}], ' ')))
    """
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(toks) - F.lit(k), F.lit(0) - F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


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


def minhash_signature(shingles: Column, n_hashes: int = 8) -> Column:
    """MinHash signature: for seed s in [0, n_hashes), the minimum of
    md5(shingle || '#' || s) over the shingle set.

    Using md5-hex strings (ASCII min) keeps the signature bit-identical to
    the DuckDB oracle twin::

        list_transform(range(0, {n}), s -> list_min(
            list_transform(shingles, sh -> md5(sh || '#' || s))))

    At scale: computed per-row from the distinct-shingle array (map-side,
    no shuffle); only the n_hashes-element signature is shuffled for LSH
    banding.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                shingles, lambda sh: F.md5(F.concat_ws("#", sh, s.cast("string")))
            )
        ),
    )
