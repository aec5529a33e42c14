"""Distributed BPE merge training — the tokenizer-training side of the
pipeline (the catalog's `bpe_token_count` APPLIES a byte-pair-ish regex;
this LEARNS the merge table from the corpus).

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
not the raw corpus: one corpus pass collapses 100 TB of text into a
vocabulary-sized (word, freq) frame, and every merge iteration after that
touches only the vocabulary — the property that makes distributed BPE
feasible at scale. Per iteration:

  1. pair counts: explode each word's adjacent symbol pairs weighted by
     word freq → partial-agg groupBy (map-side combine does most work);
  2. best pair: ORDER BY count DESC, left, right LIMIT 1 — a
     control-plane top-1 collect (the merge decision is inherently
     sequential: iteration k+1's counts depend on merge k — this is the
     irreducible sync point of the algorithm, one tiny row per round);
  3. apply: a map-side string rewrite over the symbol column. Symbols are
     joined with DOUBLE \\x1f separators and the merge pattern keeps one
     guard separator on each side, so plain replace() (left-to-right,
     non-overlapping) implements exactly BPE's greedy left-to-right merge
     while boundary separators keep a symbol from matching inside its
     neighbor's tail ("xa|b" never matches pattern "|a|b|"; adjacent
     occurrences "a b a b" still both merge because shared boundaries
     carry two separators).

The vocab frame is persisted and re-persisted per round (O(1)-deep
lineage, the connected-components discipline); symbols never leave the
executors — only the 1-row argmax crosses to the driver.

No DuckDB oracle: the merge sequence is data-dependent across iterations
(step k+1's input is step k's output), which single-statement SQL can't
express — the catalog entry is a rows-only row, and correctness is
pinned against a pure-Python reference implementation instead
(tests/test_bpe.py), including the exact tie-break (max count, then
lexicographically smallest pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from migrate_cassandra_to_mysql_spark.functions.localframe import local_frame

SEP = "\x1f"


def _to_sym_string(word_col: str) -> str:
    """Initial symbol string: one char per symbol, double-SEP joined with
    double-SEP ends: 'ab' -> '{S}{S}a{S}{S}b{S}{S}' (S = \\x1f)."""
    return (
        f"concat('{SEP}{SEP}', "
        f"concat_ws('{SEP}{SEP}', split({word_col}, '')), "
        f"'{SEP}{SEP}')"
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus; returns
    [(rank, left, right, pair_freq), ...] in merge order."""
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(F.expr(_to_sym_string("w")).alias("syms"), "freq")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list[tuple[int, str, str, int]] = []
    vocab = words
    try:
        for rank in range(n_merges):
            pairs = vocab.select(
                # split on double-SEP: ['', a, b, ..., ''] — slice ends off
                F.expr(
                    f"slice(split(syms, '{SEP}{SEP}'), 2,"
                    f" size(split(syms, '{SEP}{SEP}')) - 2)"
                ).alias("arr"),
                "freq",
            ).select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(arr) >= 2 THEN "
                        "transform(sequence(0, size(arr) - 2),"
                        " i -> struct(arr[i] AS l, arr[i + 1] AS r))"
                        " ELSE CAST(array() AS"
                        " ARRAY<STRUCT<l: STRING, r: STRING>>) END"
                    )
                ).alias("p"),
                "freq",
            )
            top = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("freq").cast("long").alias("n"))
                .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, n = top[0]["l"], top[0]["r"], top[0]["n"]
            merges.append((rank, left, right, int(n)))
            pattern = f"{SEP}{left}{SEP}{SEP}{right}{SEP}"
            replacement = f"{SEP}{left}{right}{SEP}"
            # Column literals, NOT SQL-string interpolation: learned
            # symbols are corpus-controlled, and a token containing a
            # quote or backslash ("don't", "a\\b") would make an
            # interpolated expression fail to parse data-dependently.
            new_vocab = vocab.select(
                F.replace(
                    F.col("syms"), F.lit(pattern), F.lit(replacement)
                ).alias("syms"),
                "freq",
            ).persist(StorageLevel.MEMORY_AND_DISK)
            new_vocab.count()  # materialize before dropping the parent
            if vocab is not words:
                vocab.unpersist()
            vocab = new_vocab
    finally:
        if vocab is not words:
            vocab.unpersist()
        words.unpersist()
    return merges


def bpe_merge_table(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> DataFrame:
    """The learned merges as a DataFrame (rank, left, right, pair_freq) —
    deterministic for a given corpus (exact tie-break), so a rows-only
    correctness check is stable."""
    rows = train_bpe(docs, n_merges=n_merges)
    return local_frame(
        spark, rows, "rank long, left string, right string, pair_freq long"
    )


def _sql_str_literal(s: str) -> str:
    """Quote a symbol for embedding in a SQL string literal shared by
    Spark AND DuckDB. Single quotes double ('' is the escape in both
    dialects); backslashes are REJECTED because the two dialects
    disagree (Spark's default parser treats \\ as an escape intro,
    DuckDB's standard strings treat it literally) — no one spelling is
    correct in both. Merge tables containing backslash symbols must go
    through the Column-literal path (train_bpe's in-loop rewrite), not
    the shared-SQL form."""
    if "\\" in s:
        raise ValueError(
            "apply_merges_sql cannot embed backslash symbols portably; "
            "use the Column-literal path"
        )
    return s.replace("'", "''")


def apply_merges_sql(sym_string_sql: str, merges: list[tuple[str, str]]) -> str:
    """Expression applying a FIXED merge list to a double-SEP symbol
    string: one chained replace() per merge, in merge order — the
    deployable-tokenizer form (the merge table is plan-time constant, so
    the whole tokenization is a single map-side expression chain, zero
    shuffle, zero Python). Shared verbatim by Spark and the DuckDB
    oracle: replace() is left-to-right non-overlapping in both, which
    with the separator guards is exactly greedy BPE application.
    Symbols are SQL-quoted (quotes doubled; backslashes rejected — see
    _sql_str_literal) so trained merge tables embed safely."""
    expr = sym_string_sql
    for left, right in merges:
        pattern = _sql_str_literal(f"{SEP}{left}{SEP}{SEP}{right}{SEP}")
        replacement = _sql_str_literal(f"{SEP}{left}{right}{SEP}")
        expr = f"replace({expr}, '{pattern}', '{replacement}')"
    return expr
