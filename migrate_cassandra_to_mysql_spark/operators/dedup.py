"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference's only dedup is key-level INSERT IGNORE
(`snapshot_use_pyspark.py:456` + uk_file_id, `mysql-init/init.sql:27`) —
covered by operators/snapshot.dedup_by_key. This module adds the content-
level dedup family a training-data pipeline needs.

Scale design (100 TB):
  - Shingle sets are made DISTINCT per document *before* exploding, so the
    shingle->doc inverted index carries no within-doc duplicates.
  - MinHash signatures are computed map-side per row (higher-order
    functions, no shuffle); only (band_key, doc_id) pairs — 4 small rows
    per doc — are shuffled. Candidate pairs come from an equi-join on
    band_key, which Catalyst executes as a shuffled hash join keyed on a
    high-cardinality key (no skew for natural text).
  - The O(pairs) Jaccard verification join only sees candidate pairs, not
    the full corpus cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(toks_col_name: str, k: int = 3) -> Column:
    """Distinct k-word shingles; empty array when the doc has < k tokens.

    The size guard matters: Spark's `sequence(0, n)` with negative n would
    generate a *descending* sequence, silently producing garbage shingles
    for short docs (DuckDB's range() returns empty instead).
    """
    return F.expr(
        f"CASE WHEN size({toks_col_name}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({toks_col_name}) - {k}),"
        f" i -> concat_ws(' ', slice({toks_col_name}, i + 1, {k}))))"
        f" ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def shingle_sets(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shset) with distinct k-word shingles per document."""
    return docs.select(
        "doc_id",
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    ).select("doc_id", word_shingles("toks", k).alias("shset"))


def jaccard_pairs(
    docs: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold.

    Exact (no sketching): inverted-index join on shingle -> candidate pair
    counts -> |A ∩ B| / (|A| + |B| - |A ∩ B|). The threshold comparison is
    on an exact integer ratio, so it is engine-portable with no rounding.
    """
    sh = shingle_sets(docs, text_col, k)
    sz = sh.select("doc_id", F.size("shset").cast("long").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shset").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sz.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    zb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    return (
        pairs.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", k: int = 3, n_hashes: int = 8
) -> DataFrame:
    """(doc_id, mh) — MinHash signature as an array of n_hashes md5-min hex
    strings. md5-hex string minimum is the engine-portable stand-in for a
    seeded integer hash family; swap in xxhash64 for production speed."""
    sh = shingle_sets(docs, text_col, k)
    return sh.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {n_hashes - 1}), h -> "
            f"array_min(transform(shset, sh -> md5(concat(sh, '#', "
            f"CAST(h AS STRING))))))"
        ).alias("mh"),
    )


def lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on band keys.

    Returns (doc_a, doc_b, n_bands) — pairs agreeing on >= 1 band. A pair's
    probability of surfacing is 1-(1-s^band_size)^n_bands for Jaccard s,
    the standard LSH S-curve.
    """
    n_bands = n_hashes // band_size
    sig = minhash_signatures(docs, text_col, k, n_hashes)
    bands = sig.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {n_bands - 1})")).alias("band"),
        "mh",
    ).select(
        "doc_id",
        "band",
        F.expr(
            f"concat_ws('|', slice(mh, band * {band_size} + 1, {band_size}))"
        ).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct("a.band").cast("long").alias("n_bands"))
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens using xxhash64 (production path).

    Per token: h = xxhash64(token); for each bit, +1 if set else -1;
    signature bit = sign of the per-bit sum. Hamming-near signatures =
    near-duplicate documents. Engine-internal (xxhash64 has no DuckDB twin),
    so catalog exposure is rows-only; unit tests pin its invariants.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    bit_votes = hashed.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(64)
        ],
    )
    sums = bit_votes.groupBy("doc_id").sum()
    sig = sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"sum(b{i})") > 0,
                    F.shiftleft(F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ]
        ).alias("simhash"),
    )
    return sig
