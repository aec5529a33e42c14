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

    Blocking keeps the self-join from being a full cross product — the
    join is an equi-join on the block key, so Catalyst shuffles each block
    to one place instead of broadcasting N^2 work. CAVEAT (the reason the
    catalog's embedding_near_dup uses LSH buckets instead): a block key
    with few distinct values makes the join quadratic per block — a
    popular label at 100 TB is exactly such a key. Use this form only
    when the blocking column is known high-cardinality; otherwise use
    lsh_candidate_pairs, whose bucket sizes (~N/2^n_planes) are
    independent of metadata skew.
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


def hyperplane_planes(n_planes: int = 8, dim: int = 64) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes as integer thousandths.

    Component (p, i) = (int(md5(f"{p}#{i}")[:8], 16) % 2000) - 1000, i.e.
    an integer in [-1000, 999] later divided by 1000. Derived from md5 (not
    rand()) so buckets are reproducible across task retries AND the exact
    same literals can be embedded in the DuckDB oracle.
    """
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}#{i}".encode()).hexdigest()[:8], 16) % 2000)
            - 1000
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_buckets(
    embeddings: DataFrame, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: sign bits of the dot
    products with n_planes fixed planes, concatenated to a bucket key.

    Cosine-similar vectors agree on sign bits with probability
    1 - theta/pi per plane, so a self-join on bucket_key yields near-dup
    candidates WITHOUT a label/blocking column — the no-label path that
    operators/similarity.near_dup_pairs can't cover. The whole bucket key
    is one map-side expression; only (vec_id, bucket_key) shuffles.
    """
    e = _base(embeddings)
    bits = []
    for row in hyperplane_planes(n_planes, dim):
        arr = "array(" + ", ".join(f"({n}/1000.0)" for n in row) + ")"
        bits.append(
            f"CASE WHEN aggregate(zip_with(v, {arr}, (x, y) -> x * y), 0D,"
            f" (acc, x) -> acc + x) >= 0 THEN '1' ELSE '0' END"
        )
    return e.select(
        "vec_id", "label", "v", F.expr("concat(" + ", ".join(bits) + ")").alias(
            "bucket_key"
        )
    )


def lsh_candidate_pairs(
    embeddings: DataFrame, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """All same-bucket vector pairs with their cosine — LSH blocking for
    embedding near-dup at corpus scale (expected bucket size N/2^n_planes)."""
    b = hyperplane_buckets(embeddings, n_planes, dim)
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "bucket_key"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "bucket_key"
    )
    return (
        a.join(c, "bucket_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "bucket_key",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 4,
    query_mod: int = 100,
    k: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Codebook: pass `centroids` as (c_id long, cv array<double>) — e.g. a
    k-means fit from operators/kmeans.py — or default to the first
    n_centroids vectors (deterministic stand-in; the oracle-checked
    catalog query uses this form).

    Assignment is PURE MAP-SIDE: the codebook — small by the IVF contract
    (it would be broadcast regardless) — is collected to the driver
    (control-plane-sized, like kmeans'/ivf_index's codebook collects) and
    inlined as literal vectors in an array_max over (sim, -c_id) structs:
    one cosine per centroid per row, argmax with the same tie-break as
    the previous window form (highest sim, then lowest c_id), and ZERO
    shuffle where the broadcast-cross-join + row_number window form paid
    an exchange + sort of every (vector, centroid) pair. Measured at
    sf0.1: cold 1.98s -> 0.98s, steady 0.78-0.84 -> 0.66-0.69, results
    bit-identical. Query scoring still joins on cell id only.
    """
    e = _base(embeddings)
    cents = (
        centroids
        if centroids is not None
        else e.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
        )
    ).collect()
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.round(
                        cosine(
                            F.col("v"),
                            F.array(*[F.lit(float(x)) for x in row["cv"]]),
                        ),
                        6,
                    ).alias("s"),
                    F.lit(-int(row["c_id"])).alias("negid"),
                )
                for row in cents
            ]
        )
    )
    assigned = e.withColumn("_b", best).select(
        "vec_id", "v", (-F.col("_b")["negid"]).cast("long").alias("cell")
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


def _lit_vec(values) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in values])


def _sqdist_to_lit(col: F.Column, center: list) -> F.Column:
    """Squared L2 distance between an array column slice and a literal
    center, rounded to 6 dp (cross-engine reproducibility rule)."""
    return F.round(
        F.aggregate(
            F.zip_with(col, _lit_vec(center), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_topk(
    embeddings: DataFrame,
    m: int = 4,
    n_centers: int = 4,
    query_mod: int = 100,
    k: int = 3,
) -> DataFrame:
    """Product-quantization approximate top-k (asymmetric distance).

    The 100 TB ANN *storage* path, complementing ivf_topk's pruning path:
    each corpus vector is encoded as `m` sub-space code bytes (argmin
    squared-L2 against a per-subspace codebook), compressing a
    d-dimensional float vector to m small ints — 64x here — so the
    candidate side of the scoring join carries codes, not vectors.
    Distances are asymmetric (ADC): the query keeps its full vector and
    measures against the candidate's reconstructed centers, summed across
    subspaces.

    Codebook: per subspace, the sub-vectors of the first n_centers rows
    (deterministic stand-in, same convention as ivf_topk's first-k
    codebook; swap in a k-means fit per subspace for real recall).
    Collected driver-side (control-plane-sized by the PQ contract: m *
    n_centers * (d/m) floats) and inlined as literals, so BOTH encoding
    and ADC scoring are pure map-side expression trees — the only
    shuffle is the final per-query top-k window, and the corpus is
    never reshuffled. Encoding ties break toward the lowest center id;
    distances round to 6 dp before ranking (cross-engine rule).
    """
    e = _base(embeddings)
    head = e.where(F.col("vec_id") < n_centers).select("vec_id", "v").collect()
    head.sort(key=lambda r: r["vec_id"])
    dim = len(head[0]["v"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    # centers[mi][j] = j-th center's sub-vector for subspace mi
    centers = [
        [list(r["v"][mi * sub : (mi + 1) * sub]) for r in head]
        for mi in range(m)
    ]

    def subvec(col_name: str, mi: int) -> F.Column:
        return F.slice(F.col(col_name), mi * sub + 1, sub)

    code_cols = [
        (-F.array_min(
            F.array(
                *[
                    F.struct(
                        _sqdist_to_lit(subvec("v", mi), centers[mi][j]).alias(
                            "d"
                        ),
                        F.lit(-j).alias("negj"),
                    )
                    for j in range(n_centers)
                ]
            )
        )["negj"]).cast("int")
        for mi in range(m)
    ]
    encoded = e.select(
        "vec_id", F.array(*code_cols).alias("codes")
    )
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # ADC: per subspace, pick the distance to the candidate's chosen
    # center via element_at over the literal per-center distance array.
    adc = F.round(
        sum(
            F.element_at(
                F.array(
                    *[
                        _sqdist_to_lit(subvec("qv", mi), centers[mi][j])
                        for j in range(n_centers)
                    ]
                ),
                F.col("codes")[mi] + 1,
            )
            for mi in range(m)
        ),
        6,
    )
    cand = (
        F.broadcast(q)
        .join(encoded, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            adc.alias("approx_dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.asc("approx_dist"), F.asc("n_id")
    )
    return cand.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)
