"""Distributed k-means over embedding columns — the iterative-algorithm
pattern (SURVEY §2: genuinely non-SQL-expressible; driver records it as a
rows-only capability, tests pin the invariants).

Each iteration is one declarative round:
  assign: crossJoin the corpus with the broadcast centroid table (K rows),
          argmin distance via a window — map-side per input row;
  update: posexplode + groupBy (cluster, pos) mean — the same partial-agg
          shape as plans/vectorplans.label_centroids.

Only the K x dim centroid table ever reaches the driver (control-plane
sized, the reference's D3 discipline); corpus vectors never leave
executors. Convergence: k-means inertia is non-increasing per iteration —
pinned by the unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _assign(e: DataFrame, centroids: DataFrame) -> DataFrame:
    scored = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "c_id", _sq_dist(F.col("v"), F.col("cv")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cluster"), "d2")
    )


def kmeans(
    embeddings: DataFrame, k: int = 8, n_iter: int = 5
) -> tuple[DataFrame, list[float]]:
    """Lloyd's algorithm. Returns (assignments DataFrame, inertia history).

    Initial centroids: first k vectors by vec_id (deterministic; replace
    with k-means++ sampling for production quality). Empty clusters keep
    their previous centroid.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids = (
        e.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("long").alias("c_id"), F.col("v").alias("cv"))
    )
    # Materialize the K-row codebook driver-side once per iteration.
    cent_rows = centroids.collect()
    spark = embeddings.sparkSession
    inertia_history: list[float] = []

    for _ in range(n_iter):
        cent_df = spark.createDataFrame(
            [(int(r["c_id"]), list(r["cv"])) for r in cent_rows],
            "c_id long, cv array<double>",
        )
        assigned = _assign(e, cent_df)
        agg = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val"), "d2"
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean_val"))
        )
        inertia = assigned.agg(F.sum("d2").alias("i")).collect()[0]["i"]
        inertia_history.append(float(inertia))

        new_rows = agg.collect()  # K x dim rows — control-plane sized
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean_val"]
        cent_rows = [
            {
                "c_id": r["c_id"],
                "cv": [
                    by_cluster[r["c_id"]][p]
                    for p in sorted(by_cluster[r["c_id"]])
                ]
                if r["c_id"] in by_cluster
                else list(r["cv"]),  # empty cluster: keep previous centroid
            }
            for r in cent_rows
        ]

    final_cent = spark.createDataFrame(
        [(int(r["c_id"]), list(r["cv"])) for r in cent_rows],
        "c_id long, cv array<double>",
    )
    return _assign(e, final_cent).select("vec_id", "cluster", "d2"), inertia_history
