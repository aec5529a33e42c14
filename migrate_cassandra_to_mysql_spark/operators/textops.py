"""Text-analysis operators for LLM-data-pipeline workloads.

All operators are pure built-in column expressions (no Python UDFs): token
stats, stopword-based language ID, quality scoring, and md5 document
fingerprinting. At 100 TB each runs map-side with zero shuffle — only
downstream groupBys (e.g. fingerprint dedup) shuffle, and those shuffle
already-reduced data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.text import normalized, tokens

# Small per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately tiny + overlapping is fine: the operator contract is the
# *scoring pipeline*, not lexicography.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "es", "una"),
}


def stopword_hits(toks_col_name: str, words: tuple[str, ...]) -> Column:
    """Count of tokens that appear in `words` (JVM-side higher-order fn)."""
    inlist = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"CAST(size(filter({toks_col_name}, x -> x IN ({inlist}))) AS BIGINT)"
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics (token counting, TTR)."""
    t = docs.withColumn("toks", tokens(F.col(text_col)))
    return t.select(
        "doc_id",
        "lang",
        F.length(text_col).cast("long").alias("n_chars_measured"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.col("toks"))).cast("long").alias("n_distinct_tokens"),
        F.expr(
            "CAST(aggregate(transform(toks, x -> length(x)), 0L, (a, x) -> a + x)"
            " AS BIGINT)"
        ).alias("sum_token_len"),
        (
            F.size(F.array_distinct(F.col("toks"))).cast("double")
            / F.size("toks")
        ).alias("ttr"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with a deterministic argmax cascade."""
    t = docs.withColumn("toks", tokens(F.col(text_col)))
    scored = t.select(
        "doc_id",
        F.col("lang").alias("lang_truth"),
        *[
            stopword_hits("toks", words).alias(f"{lg}_hits")
            for lg, words in STOPWORDS.items()
        ],
    )
    pred = (
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") > 0),
            F.lit("en"),
        )
        .when(
            (F.col("de_hits") >= F.col("fr_hits"))
            & (F.col("de_hits") >= F.col("es_hits"))
            & (F.col("de_hits") > 0),
            F.lit("de"),
        )
        .when(
            (F.col("fr_hits") >= F.col("es_hits")) & (F.col("fr_hits") > 0),
            F.lit("fr"),
        )
        .when(F.col("es_hits") > 0, F.lit("es"))
        .otherwise(F.lit("unk"))
    )
    return scored.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length band + stopword ratio + TTR.

    Mirrors the quality-filter stage of web-scale pretraining pipelines:
    each signal is a cheap column expression; the composite is a weighted
    sum with CASE banding so the oracle can reproduce it exactly.
    """
    t = docs.withColumn("toks", tokens(F.col(text_col)))
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.expr(
            f"CAST(size(filter(toks, x -> x IN ({en}))) AS BIGINT)"
        ).alias("stop_hits"),
        (
            F.expr(f"CAST(size(filter(toks, x -> x IN ({en}))) AS DOUBLE)")
            / F.size("toks")
        ).alias("stop_ratio"),
        (
            F.size(F.array_distinct(F.col("toks"))).cast("double") / F.size("toks")
        ).alias("ttr"),
    ).withColumn(
        "quality_band",
        F.when(F.col("n_tokens") < 20, F.lit("too_short"))
        .when(F.col("stop_ratio") >= 0.10, F.lit("high"))
        .when(F.col("stop_ratio") >= 0.03, F.lit("medium"))
        .otherwise(F.lit("low")),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> Column:
    """md5 fingerprint of whitespace-normalized, lowercased text."""
    return F.md5(normalized(F.col(text_col)))
