"""Distributed k-means over embedding columns — the iterative-algorithm
pattern (SURVEY §2: the reference has no iterative ops; this is a
north-star extension). Every arithmetic step is cross-engine
deterministic, so a fixed-iteration run has an exact SQL twin
(plans/vectorplans.kmeans_oracle generates the unrolled CTE chain):

  distance: d2 = round(v.v - 2 v.c + c.c, 6) — three sequential-fold dot
            products, the same associativity DuckDB's list_dot_product
            uses (parity proven by the embedding_* oracle queries);
  update:   element means over FLOOR(val * 1e9) integer quantization —
            exact order-independent BIGINT sums (no float partial-agg
            nondeterminism), then round(sum / (1e9 * n), 4);
  argmin:   (d2, c_id) ordering — total, tie-stable.

Each iteration is one declarative round: assign = crossJoin with the
broadcast K-row centroid table + window argmin (map-side per input row);
update = posexplode + groupBy (cluster, pos) — the same partial-agg shape
as plans/vectorplans.label_centroids. Only the K x dim centroid table ever
reaches the driver (control-plane sized, the reference's D3 discipline);
corpus vectors never leave executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.localframe import local_frame

QUANT = 1_000_000_000  # 1e9: centroid-update quantization (see module doc)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _sq_dist(a, b):
    # v.v - 2 v.c + c.c from three dots (NOT a zip_with fold of squared
    # diffs) so the float op sequence matches DuckDB's list_dot_product.
    return F.round(_dot(a, a) - 2 * _dot(a, b) + _dot(b, b), 6)


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


def _update(assigned: DataFrame, cent_rows: list) -> list:
    """Centroid update from an assignment: quantized-exact means rounded to
    4 dp; empty clusters keep their previous centroid."""
    agg = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
        .select("cluster", "pos", F.floor(F.col("val") * QUANT).alias("q"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum("q").cast("double") / (F.lit(float(QUANT)) * F.count(F.lit(1))),
                4,
            ).alias("mean_val")
        )
    )
    new_rows = agg.collect()  # K x dim rows — control-plane sized
    by_cluster: dict[int, dict[int, float]] = {}
    for r in new_rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean_val"]
    return [
        {
            "c_id": r["c_id"],
            "cv": [by_cluster[r["c_id"]][p] for p in sorted(by_cluster[r["c_id"]])]
            if r["c_id"] in by_cluster
            else list(r["cv"]),
        }
        for r in cent_rows
    ]


def init_first_k(e: DataFrame, k: int) -> list:
    """Deterministic init: the k lowest-vec_id vectors (c_id = vec_id).
    SQL-expressible — the catalog oracle uses the same rule."""
    return [
        {"c_id": int(r["vec_id"]), "cv": list(r["v"])}
        for r in e.orderBy("vec_id").limit(k).select("vec_id", "v").collect()
    ]


def init_farthest_point(e: DataFrame, k: int) -> list:
    """Greedy farthest-point init (deterministic k-means++ stand-in): start
    from the lowest vec_id, then repeatedly add the point with the maximum
    distance to its nearest chosen centroid (ties broken by vec_id). Each
    round is one distributed argmax — k-1 passes over the corpus, no
    randomness to seed, and empirically far better spread than first-k when
    the leading vec_ids are clustered."""
    spark = e.sparkSession
    first = e.orderBy("vec_id").limit(1).select("vec_id", "v").collect()[0]
    chosen = [{"c_id": int(first["vec_id"]), "cv": list(first["v"])}]
    for _ in range(k - 1):
        cent_df = local_frame(
            spark,
            [(int(r["c_id"]), list(r["cv"])) for r in chosen],
            "c_id long, cv array<double>",
        )
        far = (
            _assign(e, cent_df)
            .orderBy(F.desc("d2"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "v")
            .collect()[0]
        )
        chosen.append({"c_id": int(far["vec_id"]), "cv": list(far["v"])})
    return chosen


def _lloyd(
    embeddings: DataFrame,
    k: int,
    n_iter: int,
    init: str,
    track_inertia: bool = True,
) -> tuple[DataFrame, list, list[float]]:
    """Shared Lloyd loop: returns (e, final cent_rows, inertia history).

    track_inertia=False skips the per-iteration inertia aggregation — a
    full corpus pass per iteration whose only product is the returned
    history (guide §1.2: don't compute things you throw away). Centroid
    trajectories are identical either way: inertia never feeds the
    update."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    spark = embeddings.sparkSession
    if init == "farthest-point":
        cent_rows = init_farthest_point(e, k)
    else:
        cent_rows = init_first_k(e, k)

    inertia_history: list[float] = []
    for _ in range(n_iter):
        cent_df = local_frame(
            spark,
            [(int(r["c_id"]), list(r["cv"])) for r in cent_rows],
            "c_id long, cv array<double>",
        )
        assigned = _assign(e, cent_df)
        if track_inertia:
            inertia = assigned.agg(F.sum("d2").alias("i")).collect()[0]["i"]
            inertia_history.append(float(inertia))
        cent_rows = _update(assigned, cent_rows)
    return e, cent_rows, inertia_history


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    init: str = "first-k",
) -> tuple[DataFrame, list[float]]:
    """Lloyd's algorithm. Returns (assignments DataFrame, inertia history).

    init: 'first-k' (SQL-oracle-compatible) or 'farthest-point' (better
    spread, still deterministic). Cluster ids are the vec_ids of the init
    points in both modes.
    """
    e, cent_rows, inertia_history = _lloyd(embeddings, k, n_iter, init)
    spark = embeddings.sparkSession
    final_cent = local_frame(
        spark,
        [(int(r["c_id"]), list(r["cv"])) for r in cent_rows],
        "c_id long, cv array<double>",
    )
    return _assign(e, final_cent).select("vec_id", "cluster", "d2"), inertia_history


def train_centroid_vectors(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    init: str = "farthest-point",
) -> list:
    """Trained IVF cell codebook as plain vectors [[float]*dim]*k, in
    deterministic (c_id-sorted) order — the trained counterpart of
    similarity.first_k_cell_centroids, pluggable into ivf_topk /
    ivfpq_topk / ivf_index.build as `cell_centroids`. Same Lloyd loop as
    kmeans() (quantized-exact means, deterministic init), so a given
    corpus always trains to the identical codebook."""
    _, cent_rows, _ = _lloyd(embeddings, k, n_iter, init, track_inertia=False)
    return [
        [float(x) for x in r["cv"]]
        for r in sorted(cent_rows, key=lambda r: r["c_id"])
    ]
