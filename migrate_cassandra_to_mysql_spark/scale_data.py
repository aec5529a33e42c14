"""sf1 synthesis: scale the sf0.1 testdata 10× by key-shifted replication.

Shared by the `pytest -m scale` smoke suite and bench.py's measured sf1
block (VERDICT r5 ask #3 — scale regressions should be caught numerically
per-round, not just pass/fail).

Keys are shifted far past the source key space so every copy is a
distinct entity (cardinalities scale 10×, not just row counts). Document
text gets a per-copy suffix token so the near-dup family sees 10×
distinct-but-similar docs rather than 10 exact clones of each (exact
clones would test the dedup blowup, not the scale-up).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

DOC_ID_SHIFT = 10_000_000
USER_ID_SHIFT = 1_000_000
PART_ID_SHIFT = 1_000_000
ORDERKEY_SHIFT = 100_000_000
VEC_ID_SHIFT = 10_000_000


def synthesize_sf1(
    spark: SparkSession,
    src_sf_dir: str,
    out_dir: str,
    copies: int = 10,
    tables: "tuple[str, ...]" = (
        "documents",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ),
) -> None:
    """Write the selected tables scaled `copies`× under out_dir
    (default: all five scale-suite tables; the sf5 smoke passes just
    documents+embeddings so a 50× synthesis doesn't pay for 30M
    lineitem rows it never reads).

    Only the tables the heavy headline plans scan; each write is a flat
    map over the source (explode of a literal copy array — no shuffle)
    followed by the parquet write. Embedding copies are deterministically
    perturbed (+copy/1000 per component) so the scaled corpus is 10×
    distinct-but-similar vectors, not exact clones — copy 0 keeps the
    original values, so first-K codebook conventions (vec_id 0..k-1)
    still hold."""
    copy_col = F.explode(
        F.array(*[F.lit(i) for i in range(copies)])
    ).alias("_copy")

    docs = T(spark, src_sf_dir, "documents")
    if "documents" in tables:
        (
        docs.select("*", copy_col)
        .select(
            (F.col("doc_id") + F.col("_copy").cast("long") * F.lit(DOC_ID_SHIFT)).alias(
                "doc_id"
            ),
            F.concat(
                F.col("text"), F.lit(" copytoken"), F.col("_copy")
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(8)
        .write.parquet(f"{out_dir}/documents.parquet")
        )

    orders = T(spark, src_sf_dir, "orders")
    if "orders" in tables:
        (
        orders.select("*", copy_col)
        .select(
            (F.col("o_orderkey") + F.col("_copy").cast("long") * F.lit(ORDERKEY_SHIFT))
            .alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .repartition(8)
        .write.parquet(f"{out_dir}/orders.parquet")
        )

    li = T(spark, src_sf_dir, "lineitem")
    if "lineitem" in tables:
        (
        li.select("*", copy_col)
        .select(
            (F.col("l_orderkey") + F.col("_copy").cast("long") * F.lit(ORDERKEY_SHIFT))
            .alias("l_orderkey"),
            # partkey shifts too: derived structures over (orderkey,
            # partkey) — the co-purchase graph, z-order curve — must grow
            # in NODES/KEYS at sf1, not densify onto the sf0.1 key space
            # (10x orders on FIXED parts makes the co-purchase graph 10x
            # denser, a different asymptotic than 10x bigger; the r6
            # pagerank sf1 smoke OOM'd a 1 GB driver exactly this way).
            (F.col("l_partkey") + F.col("_copy").cast("long") * F.lit(PART_ID_SHIFT))
            .alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        )
        .repartition(8)
        .write.parquet(f"{out_dir}/lineitem.parquet")
        )

    ev = T(spark, src_sf_dir, "events")
    if "events" in tables:
        (
        ev.select("*", copy_col)
        .select(
            (F.col("event_id") + F.col("_copy").cast("long") * F.lit(ORDERKEY_SHIFT))
            .alias("event_id"),
            (F.col("user_id") + F.col("_copy").cast("long") * F.lit(USER_ID_SHIFT))
            .alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        .repartition(8)
        .write.parquet(f"{out_dir}/events.parquet")
        )

    emb = T(spark, src_sf_dir, "embeddings")
    if "embeddings" in tables:
        (
        emb.select("*", copy_col)
        .select(
            (F.col("vec_id") + F.col("_copy").cast("long") * F.lit(VEC_ID_SHIFT)).alias(
                "vec_id"
            ),
            F.transform(
                F.col("embedding"),
                lambda x: (
                    x + F.col("_copy").cast("double") / F.lit(1000.0)
                ).cast("float"),
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        .repartition(8)
        .write.parquet(f"{out_dir}/embeddings.parquet")
        )


def clustered_embeddings(
    spark: SparkSession,
    n_vectors: int = 2000,
    n_clusters: int = 8,
    dim: int = 16,
    seed: int = 7,
    sigma: float = 0.15,
):
    """Deterministic mixture-of-Gaussians embedding fixture (VERDICT r6
    ask #2): the sf testdata's embeddings are iid-random, which makes ANN
    recall pure tie-break noise — on THIS corpus, recall against
    brute_force_topk is a real signal (true neighbors share the query's
    Gaussian component, so a codebook that recovers the components wins
    measurably).

    Cluster assignment is a seeded draw EXCEPT the first 2*n_clusters
    vectors, which are pinned to component 0 — the realistic adversary
    for first-K codebooks (corpora arrive grouped by source, so leading
    rows cluster together and first-K centroids collapse onto one
    component). Pure `random.Random(seed)` — no numpy dependency, stable
    across platforms.
    """
    import random

    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n_vectors):
        c = 0 if i < 2 * n_clusters else rng.randrange(n_clusters)
        v = [centers[c][d] + rng.gauss(0.0, sigma) for d in range(dim)]
        rows.append((i, f"c{c}", v))
    from migrate_cassandra_to_mysql_spark.functions.localframe import (
        local_frame,
    )

    return local_frame(
        spark, rows, "vec_id long, label string, embedding array<float>"
    )
