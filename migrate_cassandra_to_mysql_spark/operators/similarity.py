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


# MMR score literals as SHARED STRINGS: Python's 1 - 0.7 is
# 0.30000000000000004, so building the complement numerically on one
# side and writing "0.3" on the other would diverge in the last ulp —
# both engines must compile the identical literal text.
MMR_LAMBDA_SQL = "0.7"
MMR_COMPLEMENT_SQL = "0.3"


def mmr_rerank(
    embeddings: DataFrame,
    query_pred,
    n_candidates: int = 20,
    k: int = 5,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity pass a retrieval stack runs over its top-N:
    greedily build a k-list where each pick maximizes
    lambda * rel(d) - (1 - lambda) * max_{s in selected} sim(d, s),
    trading relevance against redundancy with what is already shown.
    Returns (q_id, n_id, step, rel) — step is the greedy pick order.

    Scale shape — everything after candidate generation is BOUNDED BY
    N (the candidate depth), never the corpus: the exact top-N comes
    from the brute-force baseline (queries broadcast, corpus never
    shuffles); candidate-candidate similarities are an N^2-per-query
    self-join of the candidate list (400 rows/query at N=20); the
    greedy loop is UNROLLED k-1 times as plan operators (the
    hybrid-RRF bounded-by-k discipline — each iteration is one
    anti-join + one max-aggregation + one window over <=N rows per
    query, all on the same q_id partitioning). The candidate and pair
    frames are EAGERLY localCheckpoint-ed before the loop (the
    components.pagerank lineage discipline): each unrolled stage
    references both, so without truncation the candidate-generation
    subtree re-expands per stage and the physical plan grows ~4^k
    (measured: 1361 exchanges in the naive plan vs a handful after) —
    the checkpoint jobs are bounded by queries x N^2, the same
    plan-time-work contract as the memoized index builds. No
    driver-side collect anywhere.

    Determinism: rel and pairwise sims round to 6 dp (the module's
    cosine discipline); the MMR score is one fixed expression over
    those rounded inputs with the shared literal lambda text; n_id
    breaks every tie."""
    e = _base(embeddings)
    base = brute_force_topk(embeddings, query_pred, k=n_candidates)
    cand = base.select("q_id", "n_id", F.col("cos_sim").alias("rel"))
    va = e.select(F.col("vec_id").alias("n_id"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("s_id"), F.col("v").alias("vb"))
    # The candidate-pair frame is queries x N^2 by CONTRACT (the
    # docstring's bounded-by-N claim), but the checkpoint-fed subtrees
    # carry no size statistics, so Catalyst planned the vector
    # attachment joins as sort-merge — shuffling the CORPUS (va/vb)
    # both times, exactly what the scale shape here promises never
    # happens. Broadcast the bounded side explicitly (guide §3.1):
    # the corpus is then only ever the streamed probe side of a
    # broadcast hash join, never exchanged.
    #
    # SIZE CEILING (r14 ADVICE): the broadcast relation after the va
    # join is |queries| x N^2 rows EACH CARRYING a dim-double vector —
    # at N=20 / dim=64 that is ~3.4 KB per query-pair-block, so ~1 GB
    # of broadcast per ~300k queries. Spark hard-caps a broadcast
    # relation at 8 GB / 512M rows, and the driver must hold the built
    # relation; a caller batching MILLIONS of queries through one call
    # must split the query set (the hint is advisory for strategy, not
    # a correctness gate — an oversized build side fails the job
    # loudly at the broadcast step, it can never return wrong rows).
    cp = (
        cand.select("q_id", "n_id")
        .join(F.broadcast(cand.select("q_id", F.col("n_id").alias("s_id"))), "q_id")
        .where(F.col("n_id") != F.col("s_id"))
    )
    pairs = (
        F.broadcast(F.broadcast(cp).join(va, "n_id"))
        .join(vb, "s_id")
        .select(
            "q_id",
            "n_id",
            "s_id",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
    )
    cand = cand.localCheckpoint(eager=True)
    pairs = pairs.localCheckpoint(eager=True)
    w1 = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("n_id"))
    sel = (
        cand.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("q_id", "n_id", "rel", F.lit(1).alias("step"))
    )
    mmr_expr = (
        f"round({MMR_LAMBDA_SQL} * rel - {MMR_COMPLEMENT_SQL} * maxsim, 6)"
    )
    for step in range(2, k + 1):
        # The five stage joins plan as SORT-MERGE over the bounded
        # checkpoint-fed frames. That is DELIBERATE (r15, guide §1.1):
        # broadcasting the bounded sides here — the same §3.1 move
        # that pays in the pair build above — was A/B'd and measured a
        # WASH (cold-first 10.4s broadcast vs 10.7s SMJ at equal
        # calibration; warm ~5s both): each of the k-1 stages would
        # build 3 broadcast relations (a driver collect + re-ship
        # each, with the rem frame computed twice — once into its
        # broadcast, once streamed), eating exactly what the removed
        # few-hundred-row SMJ exchanges cost. Kept as SMJ: same
        # measured speed, no per-stage driver round-trips.
        picked = sel.select("q_id", "n_id")
        rem = cand.join(picked, ["q_id", "n_id"], "left_anti")
        ms = (
            rem.join(pairs, ["q_id", "n_id"])
            .join(
                picked.select("q_id", F.col("n_id").alias("s_id")),
                ["q_id", "s_id"],
            )
            .groupBy("q_id", "n_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        wp = Window.partitionBy("q_id").orderBy(
            F.desc("mmr"), F.asc("n_id")
        )
        pick = (
            rem.join(ms, ["q_id", "n_id"])
            .withColumn("mmr", F.expr(mmr_expr))
            .withColumn("rn", F.row_number().over(wp))
            .where(F.col("rn") == 1)
            .select("q_id", "n_id", "rel", F.lit(step).alias("step"))
        )
        # per-round truncation, exactly like components.pagerank: sel is
        # referenced three times per stage, so an uncheckpointed union
        # still compounds the operator tree ~3^k. The LAST stage stays
        # un-checkpointed so the returned plan (and its pinned feature
        # vector) shows one representative greedy stage instead of a
        # bare checkpoint scan.
        sel = sel.unionByName(pick)
        if step < k:
            sel = sel.localCheckpoint(eager=True)
    return sel.select(
        "q_id", "n_id", F.col("step").cast("long").alias("step"), "rel"
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


def first_k_centroid_rows(embeddings: DataFrame, k: int) -> list:
    """First-K IVF codebook, collected: [{'c_id', 'cv'}] for the k
    lowest-vec_id vectors. Control-plane sized; callers that serve many
    queries should collect once and pass the rows to ivf_topk (the
    catalog memoizes per sf_dir — train-once, query-many)."""
    e = _base(embeddings)
    return [
        {"c_id": int(r["vec_id"]), "cv": list(r["v"])}
        for r in sorted(
            e.where(F.col("vec_id") < k).select("vec_id", "v").collect(),
            key=lambda r: r["vec_id"],
        )
    ]


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 4,
    query_mod: int = 100,
    k: int = 3,
    centroids: DataFrame | list | None = None,
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
    if centroids is None:
        cents = first_k_centroid_rows(embeddings, n_centroids)
    elif isinstance(centroids, DataFrame):
        cents = centroids.collect()
    else:  # pre-collected rows/dicts — lets callers memoize train-once
        cents = centroids
    structs = ", ".join(
        f"named_struct('s', round({_sql_cos_lit('v', list(row['cv']))}, 6),"
        f" 'negid', {-int(row['c_id'])})"
        for row in cents
    )
    best = F.expr(f"array_max(array({structs}))")
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


# Literal-codebook expressions are generated as SQL STRINGS (one
# spark.sql parse) rather than nested Column constructors: a 4x4x16
# codebook otherwise costs ~2000 py4j round-trips PER PLAN BUILD —
# measured 0.6-1.3s of pure driver-side construction time per ANN query
# (the execution plan is identical either way; same trick as
# hyperplane_buckets above).


def _sql_vec(values) -> str:
    return "array(" + ", ".join(f"{float(x)!r}D" for x in values) + ")"


def _sql_sqdist(col_expr: str, center: list) -> str:
    """Squared L2 distance between an array expression and a literal
    center, rounded to 6 dp (cross-engine reproducibility rule). Same
    fold shape as the Column form it replaced: zip_with squared diffs,
    sequential double accumulation."""
    arr = _sql_vec(center)
    return (
        f"round(aggregate(zip_with({col_expr}, {arr},"
        f" (a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), 6)"
    )


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        f" (acc, x) -> acc + x)"
    )


def _sql_cos_lit(col_expr: str, vec: list) -> str:
    """cosine(col, literal) with the exact operation sequence of
    functions/vectors.cosine: dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))).
    The literal-side norm stays in SQL so constant folding computes it
    with the same JVM arithmetic the Column form used."""
    arr = _sql_vec(vec)
    return (
        f"({_sql_dot(col_expr, arr)} / (sqrt({_sql_dot(col_expr, col_expr)})"
        f" * sqrt({_sql_dot(arr, arr)})))"
    )


def _first_k_pq_centers(e: DataFrame, m: int, n_centers: int) -> list:
    """First-K PQ codebook: centers[mi][j] = subspace-mi sub-vector of the
    j-th lowest-vec_id row. Deterministic and SQL-oracle-able; the trained
    alternative is pq_train_centers()."""
    head = e.where(F.col("vec_id") < n_centers).select("vec_id", "v").collect()
    head.sort(key=lambda r: r["vec_id"])
    # The oracle keys centers on vec_id = j, while the code below indexes
    # list positions — a sparse/partial id space would silently misalign
    # them. Fail loudly instead.
    assert [r["vec_id"] for r in head] == list(range(n_centers)), (
        f"PQ codebook requires vec_ids 0..{n_centers - 1}, got "
        f"{[r['vec_id'] for r in head]}"
    )
    dim = len(head[0]["v"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    return [
        [list(r["v"][mi * sub : (mi + 1) * sub]) for r in head]
        for mi in range(m)
    ]


def first_k_pq_centers(embeddings: DataFrame, m: int, n_centers: int) -> list:
    """Public collected form of the first-K PQ codebook (see
    _first_k_pq_centers) — callers memoize it for train-once serving."""
    return _first_k_pq_centers(_base(embeddings), m, n_centers)


def first_k_cell_centroids(embeddings: DataFrame, n_cells: int) -> list:
    """First-K IVF cell centroids as plain vectors [[float]*dim]*n_cells
    (index == cell id), asserted dense on vec_id 0..n_cells-1."""
    head = (
        _base(embeddings)
        .where(F.col("vec_id") < n_cells)
        .select("vec_id", "v")
        .collect()
    )
    head.sort(key=lambda r: r["vec_id"])
    assert [r["vec_id"] for r in head] == list(range(n_cells)), (
        f"IVF codebook requires vec_ids 0..{n_cells - 1}"
    )
    return [list(r["v"]) for r in head]


def _subvec(col_name: str, mi: int, sub: int) -> F.Column:
    """Sub-vector mi of an array column (1-based slice of width `sub`)."""
    return F.slice(F.col(col_name), mi * sub + 1, sub)


def _pq_code_cols(
    centers: list, n_centers: int, sub: int, vec_sql: str = "v"
) -> list:
    """Per-subspace PQ code expressions (argmin squared-L2 against the
    literal codebook). array_min over (d, j) structs compares d first,
    then j ascending — so a distance tie picks the LOWEST center id,
    matching the oracle's ORDER BY d, j. (Pairing negation with
    array_min, as an earlier draft did, double-inverts the tie-break.)
    `vec_sql` is the SQL expression for the vector being encoded — "v"
    for raw encoding, a zip_with residual expression for IVFADC-proper
    residual encoding."""
    cols = []
    for mi in range(len(centers)):
        sv = f"slice({vec_sql}, {mi * sub + 1}, {sub})"
        structs = ", ".join(
            f"named_struct('d', {_sql_sqdist(sv, centers[mi][j])}, 'j', {j})"
            for j in range(n_centers)
        )
        cols.append(
            F.expr(f"cast(array_min(array({structs})).j AS int)")
        )
    return cols


def _adc_expr(
    centers: list, n_centers: int, sub: int, qv_sql: str = "qv"
) -> F.Column:
    """Asymmetric-distance expression: per subspace, distance from the
    query's sub-vector (`qv_sql`, default the `qv` column; a residual
    expression in residual mode) to the candidate's chosen center via
    element_at over the literal per-center distance array, summed across
    subspaces and rounded to 6 dp (cross-engine rule)."""
    terms = []
    for mi in range(len(centers)):
        qsv = f"slice({qv_sql}, {mi * sub + 1}, {sub})"
        dists = ", ".join(
            _sql_sqdist(qsv, centers[mi][j]) for j in range(n_centers)
        )
        terms.append(f"element_at(array({dists}), codes[{mi}] + 1)")
    return F.expr(f"round({' + '.join(terms)}, 6)")


def _residual_sql(vec_col: str, cell_col: str, cell_centroids: list) -> str:
    """SQL expression for the IVF residual vec - centroid[cell]: the
    centroid table rides as one literal array-of-arrays, indexed map-side
    by the row's cell id — no join, no shuffle."""
    cents = "array(" + ", ".join(
        _sql_vec(list(cv)) for cv in cell_centroids
    ) + ")"
    return (
        f"zip_with({vec_col}, element_at({cents}, cast({cell_col} AS int)"
        f" + 1), (x, y) -> x - y)"
    )


def pq_topk(
    embeddings: DataFrame,
    m: int = 4,
    n_centers: int = 4,
    query_mod: int = 100,
    k: int = 3,
    centers: list | None = None,
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
    codebook), or pass `centers` — e.g. a pq_train_centers() k-means fit
    — as centers[mi][j] sub-vector lists for real recall. Collected
    driver-side (control-plane-sized by the PQ contract: m * n_centers *
    (d/m) floats) and inlined as literals, so BOTH encoding and ADC
    scoring are pure map-side expression trees — the only shuffle is the
    final per-query top-k window, and the corpus is never reshuffled.
    Encoding ties break toward the lowest center id; distances round to
    6 dp before ranking (cross-engine rule).
    """
    e = _base(embeddings)
    if centers is None:
        centers = _first_k_pq_centers(e, m, n_centers)
    sub = len(centers[0][0])
    encoded = e.select(
        "vec_id", F.array(*_pq_code_cols(centers, n_centers, sub)).alias("codes")
    )
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = (
        F.broadcast(q)
        .join(encoded, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            _adc_expr(centers, n_centers, sub).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.asc("approx_dist"), F.asc("n_id")
    )
    return cand.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)


def ranked_cells_expr(col: str, cell_centroids: list) -> F.Column:
    """Ranked cell list per row: array_sort over (-sim, c_id) structs =
    sim desc then c_id asc — element 0 is the assignment cell, the first
    n_probe are a query's probe set. One map-side SQL expression over
    the array column named `col`."""
    cell_structs = ", ".join(
        f"named_struct('negs', -round({_sql_cos_lit(col, list(cv))}, 6),"
        f" 'c', {c})"
        for c, cv in enumerate(cell_centroids)
    )
    return F.expr(f"array_sort(array({cell_structs}))")


def ivfpq_encode(
    embeddings: DataFrame,
    cell_centroids: list,
    centers: list,
    residual: bool = False,
) -> DataFrame:
    """(vec_id, cell, codes): the IVFADC encoding — nearest IVF cell plus
    per-subspace PQ codes, all map-side literal-codebook expressions.
    Shared by the inline search (ivfpq_topk) and the persisted index
    build (operators/ivf_index.build_ivfpq_index), so the on-disk codes
    are bit-identical to what the inline oracle-checked path computes.

    residual=True encodes x - centroid[cell(x)] instead of x — the
    IVFADC-proper form (Jégou et al. 2011 §IV.B): residuals live on the
    within-cell noise scale, so a fixed-size PQ codebook spends its
    resolution on exactly the distances that rank neighbors inside a
    probed cell. Raw encoding (the default) stays the SQL-oracle-able
    catalog form. The residual is one map-side zip_with against the
    literal centroid table — the encode stays shuffle-free."""
    e = _base(embeddings)
    n_centers = len(centers[0])
    sub = len(centers[0][0])
    ranked = ranked_cells_expr("v", cell_centroids)
    with_cell = e.select(
        "vec_id", "v", ranked[0]["c"].cast("long").alias("cell")
    )
    vec_sql = (
        _residual_sql("v", "cell", cell_centroids) if residual else "v"
    )
    return with_cell.select(
        "vec_id",
        "cell",
        F.array(
            *_pq_code_cols(centers, n_centers, sub, vec_sql=vec_sql)
        ).alias("codes"),
    )


def residual_frame(embeddings: DataFrame, cell_centroids: list) -> DataFrame:
    """(vec_id, label, embedding=v - centroid[cell(v)]): the corpus in
    residual space — the training input for a residual PQ codebook
    (pass to pq_train_centers). Map-side only."""
    e = _base(embeddings)
    ranked = ranked_cells_expr("v", cell_centroids)
    with_cell = e.select(
        "vec_id", "label", "v", ranked[0]["c"].cast("long").alias("cell")
    )
    return with_cell.select(
        "vec_id",
        "label",
        F.expr(_residual_sql("v", "cell", cell_centroids)).alias(
            "embedding"
        ),
    )


def ivfpq_topk(
    embeddings: DataFrame,
    n_cells: int = 4,
    m: int = 4,
    n_centers: int = 4,
    query_mod: int = 100,
    k: int = 3,
    n_probe: int = 2,
    cell_centroids: list | None = None,
    centers: list | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVFADC: IVF cell pruning composed with PQ/ADC scoring — the actual
    100 TB ANN search path (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011, §IV). Flat PQ scans every code;
    IVF-alone carries full vectors into the scoring join. Composed, a
    query touches only its n_probe nearest cells AND each candidate costs
    m code lookups instead of a d-dim vector read — at 1000 executors the
    corpus is partitioned by cell on disk, so the probe set prunes whole
    partitions and the per-partition payload is 64× smaller.

    Composition contract (mirrors the standalone halves exactly):
      - cell assignment: argmax cosine over the IVF codebook, ties to the
        lowest c_id (ivf_topk's rule);
      - queries probe their n_probe nearest cells (sim desc, c_id asc);
      - candidate scoring: ADC against the PQ codebook (pq_topk's rule —
        per-subspace 6-dp-rounded squared-L2, summed, re-rounded);
      - per-query top-k on (approx_dist asc, n_id asc).

    Both codebooks default to the deterministic first-K convention (and
    are then SQL-oracle-able); pass `cell_centroids` ([[float]*dim]*n_cells)
    and/or `centers` (centers[mi][j] sub-vectors, e.g. pq_train_centers)
    for trained recall, and `residual=True` (with a residual-trained
    codebook — pq_train_centers over residual_frame) for IVFADC-proper
    residual encoding: in residual mode each probed cell scores the
    query's residual against THAT cell's residual codes (the per-cell
    query residual is one map-side zip_with; Jégou et al. 2011 §IV.B).
    Everything before the final top-k window is map-side
    literal-expression work: encode, assign, and probe all ride the
    corpus/query scans, the scoring join is a broadcast equi-join on
    cell, and the only shuffle is the top-k window (WindowGroupLimit caps
    it map-side).
    """
    e = _base(embeddings)
    if centers is None:
        centers = _first_k_pq_centers(e, m, n_centers)
    sub = len(centers[0][0])
    if cell_centroids is None:
        cell_centroids = first_k_cell_centroids(embeddings, n_cells)

    ranked = ranked_cells_expr("v", cell_centroids)
    encoded = ivfpq_encode(
        embeddings, cell_centroids, centers, residual=residual
    )
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.slice(
                F.transform(ranked, lambda x: x["c"].cast("long")), 1, n_probe
            )
        ).alias("q_cell"),
    )
    qv_sql = (
        _residual_sql("qv", "q_cell", cell_centroids) if residual else "qv"
    )
    cand = (
        F.broadcast(q)
        .join(encoded, F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            "cell",
            _adc_expr(centers, n_centers, sub, qv_sql=qv_sql).alias(
                "approx_dist"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("approx_dist"), F.asc("n_id"))
    return cand.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)


def ivfpq_rerank_topk(
    embeddings: DataFrame,
    n_cells: int = 4,
    m: int = 4,
    n_centers: int = 4,
    query_mod: int = 100,
    k: int = 3,
    n_probe: int = 2,
    shortlist: int = 50,
    cell_centroids: list | None = None,
    centers: list | None = None,
    residual: bool = False,
) -> DataFrame:
    """ADC shortlist + exact re-rank — the standard production IVFADC
    serving composition: the compressed index proposes a per-query
    shortlist (top-`shortlist` by ADC, cheap, code-only), then ONLY those
    candidates' full vectors are fetched and exact-cosine re-ranked to
    the final top-k. Quality is bounded by shortlist recall (the PQ
    codebook's job) times cell capture (the IVF codebook's job) — the
    two quantities tests/test_ann_recall.py pins on the clustered
    fixture.

    Scale shape: the shortlist is queries x shortlist rows —
    control-plane small — so it BROADCASTS against the corpus scan for
    the vector fetch (no corpus shuffle; at 100 TB the fetch reads only
    the rows a Bloom/DPP filter on vec_id admits), and the final exact
    top-k windows over queries x shortlist rows, not the corpus."""
    short = ivfpq_topk(
        embeddings,
        n_cells=n_cells,
        m=m,
        n_centers=n_centers,
        query_mod=query_mod,
        k=shortlist,
        n_probe=n_probe,
        cell_centroids=cell_centroids,
        centers=centers,
        residual=residual,
    ).select("q_id", "n_id")
    e = _base(embeddings)
    q = e.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    fetched = F.broadcast(short).join(
        e.select(F.col("vec_id").alias("n_id"), F.col("v").alias("nv")),
        "n_id",
    )
    scored = fetched.join(F.broadcast(q), "q_id").select(
        "q_id",
        "n_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)


def pq_distortion(embeddings: DataFrame, centers: list) -> float:
    """Mean total quantization error of a PQ codebook over the corpus —
    sum over subspaces of the squared-L2 distance to the chosen (nearest)
    center, averaged over rows. This is the objective k-means training
    minimizes, and the right codebook-quality measure on corpora where
    top-k recall is tie-break-dominated (e.g. iid-random embeddings,
    where every same-cell candidate encodes identically). One map-side
    pass + a scalar agg; only the average reaches the driver."""
    e = _base(embeddings)
    n_centers = len(centers[0])
    sub = len(centers[0][0])
    mins = []
    for mi in range(len(centers)):
        sv = f"slice(v, {mi * sub + 1}, {sub})"
        dists = ", ".join(
            _sql_sqdist(sv, centers[mi][j]) for j in range(n_centers)
        )
        mins.append(f"array_min(array({dists}))")
    tot = F.expr(" + ".join(mins))
    return float(e.select(F.avg(tot).alias("d")).collect()[0]["d"])


def pq_train_centers(
    embeddings: DataFrame, m: int = 4, n_centers: int = 4, n_iter: int = 2
) -> list:
    """Per-subspace k-means PQ codebook (the trained, non-default path;
    first-K remains the SQL-oracle-able default).

    All m subspaces train TOGETHER in one Spark job per Lloyd iteration:
    encode with the current codebook (map-side literal expressions), then
    posexplode (code, sub-vector) pairs and take quantized element means
    per (subspace, code, pos) — the same FLOOR(val*1e9) exact-integer-sum
    arithmetic as operators/kmeans.py, so training is deterministic.
    Only the m * n_centers * (d/m) codebook ever reaches the driver.
    Empty codes keep their previous center (standard Lloyd practice).
    """
    e = _base(embeddings)
    centers = _first_k_pq_centers(e, m, n_centers)
    sub = len(centers[0][0])
    quant = 1_000_000_000
    for _ in range(n_iter):
        pairs = F.arrays_zip(
            F.array(*_pq_code_cols(centers, n_centers, sub)).alias("code"),
            F.array(
                *[_subvec("v", mi, sub) for mi in range(m)]
            ).alias("sv"),
        )
        agg = (
            e.select(F.posexplode(pairs).alias("mi", "p"))
            .select(
                "mi",
                F.col("p")["code"].alias("code"),
                F.posexplode(F.col("p")["sv"]).alias("pos", "val"),
            )
            .groupBy("mi", "code", "pos")
            .agg(
                F.round(
                    F.sum(F.floor(F.col("val") * quant)).cast("double")
                    / (F.lit(float(quant)) * F.count(F.lit(1))),
                    4,
                ).alias("mean_val")
            )
            .collect()
        )
        new: dict[tuple[int, int], dict[int, float]] = {}
        for r in agg:
            new.setdefault((r["mi"], r["code"]), {})[r["pos"]] = r["mean_val"]
        centers = [
            [
                [new[(mi, j)][p] for p in sorted(new[(mi, j)])]
                if (mi, j) in new
                else centers[mi][j]
                for j in range(n_centers)
            ]
            for mi in range(m)
        ]
    return centers


# ---------------------------------------------------------------------------
# Maximum-inner-product (MIPS) serving — the non-cosine metric rung.
# ---------------------------------------------------------------------------

_IP_WEIGHT_SQL = "(1.0D + CAST(vec_id % 7 AS DOUBLE) / 4.0D)"


def ip_scaled(embeddings: DataFrame) -> DataFrame:
    """(vec_id, v) with each vector scaled by a deterministic per-id
    weight 1 + (vec_id % 7)/4 — the MIPS corpus. The test embeddings
    are unit-norm, where inner product degenerates to cosine; the
    scaling plays the role real un-normalized serving vectors play
    (recommender item embeddings carry popularity/quality in their
    NORM — Koren et al.'s matrix-factorization convention — which is
    exactly why MIPS is its own retrieval problem, cf. Shrivastava &
    Li 2014 ALSH). The weight's arithmetic is ulp-safe cross-engine:
    m/4 is an exact binary quarter, 1+q exact, so x*w is ONE IEEE
    multiply in both engines (and in the Python-side centroid
    scaling)."""
    e = _base(embeddings)
    return e.select(
        "vec_id",
        F.expr(f"transform(v, x -> x * {_IP_WEIGHT_SQL})").alias("v"),
    )


def ip_centroid_rows(embeddings: DataFrame, k: int) -> list:
    """First-K codebook IN THE SCALED MIPS SPACE: the quantizer must
    live in the metric's own space (Faiss METRIC_INNER_PRODUCT trains
    its coarse quantizer on the served vectors, not on normalized
    ones). Python scaling here is bit-equal to the SQL transform (see
    ip_scaled)."""
    return [
        {
            "c_id": r["c_id"],
            "cv": [
                x * (1.0 + (r["c_id"] % 7) / 4.0) for x in r["cv"]
            ],
        }
        for r in first_k_centroid_rows(embeddings, k)
    ]


def ivf_ip_topk(
    embeddings: DataFrame,
    n_centroids: int = 4,
    query_mod: int = 100,
    k: int = 3,
    n_probe: int = 2,
    centroids: list | None = None,
) -> DataFrame:
    """IVF maximum-inner-product top-k over the scaled MIPS corpus —
    the missing METRIC rung of the serving ladder (every other rung
    ranks by cosine): cell assignment AND query probing both argmax
    the INNER PRODUCT against the codebook (the Faiss IndexIVFFlat /
    METRIC_INNER_PRODUCT composition), each query probes its top
    `n_probe` cells, and candidates in probed cells rank by the exact
    dot product. MIPS has no triangle inequality and is not a metric —
    the assignment geometry genuinely differs from the cosine rungs'
    (high-norm vectors dominate cells), which is what the row
    demonstrates: tests pin that IP top-k != cosine top-k on the same
    corpus, and that all-probes == brute-force MIPS.

    Scale shape (the ivf_topk discipline exactly): scaling, assignment
    and probe ranking are ONE map-side expression chain over a literal
    codebook — zero shuffle, no window; the exploded (query, probed
    cell) rows broadcast against the cell-equijoined corpus, so the
    corpus never shuffles and unprobed cells' rows never join; the
    only ordered state is the per-query top-k window over the
    candidate set. Same plan at 10^9 vectors with a real k-means
    codebook passed via `centroids`.

    Determinism: the weight arithmetic is exact (see ip_scaled);
    every inner product folds through round(·, 6) before any
    comparison; assignment/probe ties break to the lowest c_id and
    serving ties to the lowest n_id — total orders everywhere."""
    scaled = ip_scaled(embeddings)
    cents = (
        ip_centroid_rows(embeddings, n_centroids)
        if centroids is None
        else centroids
    )
    cell_structs = ", ".join(
        f"named_struct('negs',"
        f" -round({_sql_dot('v', _sql_vec(row['cv']))}, 6),"
        f" 'c', {int(row['c_id'])})"
        for row in cents
    )
    b = scaled.withColumn(
        "_rc", F.expr(f"array_sort(array({cell_structs}))")
    )
    asn = b.select(
        "vec_id", "v", F.expr("CAST(_rc[0].c AS BIGINT)").alias("cell")
    )
    q = b.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.expr(
                f"transform(slice(_rc, 1, {n_probe}),"
                " s -> CAST(s.c AS BIGINT))"
            )
        ).alias("p_cell"),
    )
    cand = (
        F.broadcast(q)
        .join(asn, F.col("p_cell") == F.col("cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            "cell",
            F.round(
                F.expr(f"{_sql_dot('qv', 'v')}"), 6
            ).alias("ip"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("ip"), F.asc("n_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .where(F.col("rnk") <= k)
    )
