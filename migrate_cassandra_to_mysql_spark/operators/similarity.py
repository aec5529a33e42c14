"""Similarity search over embedding columns (array<float>).

Two strategies:
  - brute_force_topk: exact cosine top-k. The query set is broadcast; the
    corpus side never shuffles — each partition scores its rows against
    every query and a TakeOrdered-style window keeps k. Correctness
    baseline; O(Q*N) work.
  - ivf_topk: IVF-style approximate search. A small centroid codebook is
    broadcast; every vector is assigned to its nearest centroid map-side;
    queries only score vectors in their own cell. This is the 100 TB path:
    the expensive scoring join is pruned by cell, and cells can be
    bucketed/partitioned on disk so a query touches one partition.

All math uses higher-order functions on array<double> (JVM, codegen) —
no Python. Similarities are rounded to 6 dp before ranking so ordering is
reproducible across engines (ulp-level accumulation differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.vectors import cosine


def _base(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def brute_force_topk(
    embeddings: DataFrame, query_pred, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors for every query row (query_pred selects them)."""
    e = _base(embeddings)
    q = e.where(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            "label",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.4, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    Blocking (here: label; in production a coarse LSH/IVF cell id) keeps the
    self-join from being a full cross product — the join is an equi-join on
    the block key, so Catalyst shuffles each block to one place instead of
    broadcasting N^2 work.
    """
    e = _base(embeddings)
    a = e.select(
        F.col(block_col).alias("blk"), F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
    )
    b = e.select(
        F.col(block_col).alias("blk"), F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("blk").alias("label"),
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 4,
    query_mod: int = 100,
    k: int = 3,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Codebook = the first n_centroids vectors (deterministic stand-in for a
    k-means fit, which would be an offline job at scale). Assignment is a
    broadcast cross join + argmax window — map-side per input row. Query
    scoring joins on cell id only.
    """
    e = _base(embeddings)
    cents = e.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    scored = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "v",
            "c_id",
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("c_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cell"))
    )
    q = assigned.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("cell").alias("q_cell"),
    )
    cand = (
        F.broadcast(q)
        .join(assigned, F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.col("cell").cast("long").alias("cell"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .where(F.col("rnk") <= k)
    )
