"""Similarity-search + multimodal query catalog (north-star extension ops).

Cosine math: Spark computes dot products with sequential higher-order
aggregation over array<double>; DuckDB with list_dot_product over DOUBLE[]
casts. Both are double-precision over identical float32 inputs; results are
rounded to 6 dp before any ranking/thresholding so ulp-level accumulation
differences cannot flip an ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.localframe import local_frame

from migrate_cassandra_to_mysql_spark.functions.vectors import cosine
from migrate_cassandra_to_mysql_spark.operators import similarity
from migrate_cassandra_to_mysql_spark.plans.registry import register
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


@register(
    "embedding_topk_cosine",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
 sims AS (SELECT q.q_id, e.vec_id AS n_id, e.label,
                 {_COS.format(a='q.qv', b='e.v')} AS cos_sim
          FROM q CROSS JOIN e WHERE e.vec_id != q.q_id),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, n_id) AS rnk
            FROM sims)
SELECT q_id, n_id, label, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for 8 query vectors — the ANN
    correctness baseline. Queries broadcast; corpus never shuffles."""
    return similarity.brute_force_topk(
        T(spark, sf_dir, "embeddings"), F.col("vec_id") < 8, k=5
    )


@register(
    "embedding_ivf_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
 c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
 scored AS (SELECT e.vec_id, e.v, c.c_id,
                   {_COS.format(a='e.v', b='c.cv')} AS c_sim
            FROM e CROSS JOIN c),
 asn AS (SELECT vec_id, v, c_id AS cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY c_sim DESC, c_id) AS rn
           FROM scored) t
         WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv, cell AS q_cell FROM asn
       WHERE vec_id % 100 = 0),
 cand AS (SELECT q.q_id, a.vec_id AS n_id, CAST(a.cell AS BIGINT) AS cell,
                 {_COS.format(a='q.qv', b='a.v')} AS cos_sim
          FROM q JOIN asn a ON a.cell = q.q_cell AND a.vec_id != q.q_id),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, n_id) AS rnk
            FROM cand)
SELECT q_id, n_id, cell, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-3: nearest-centroid cell assignment,
    then per-cell search only — the scale path for ANN (prunes the scoring
    join from O(N) to O(N / n_cells) per query). The codebook collect is
    memoized per sf_dir (train-once, query-many — the same discipline as
    ivf_persisted_topk's index build), so repeated serving pays zero
    control-plane jobs at plan time."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cents = memo(
        ("ivf_centroid_rows", sf_dir),
        lambda: similarity.first_k_centroid_rows(emb, 4),
    )
    return similarity.ivf_topk(
        emb, n_centroids=4, query_mod=100, k=3, centroids=cents
    )


@register(
    "embedding_pq_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 c AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < 4),
 mi AS (SELECT unnest([0, 1, 2, 3]) AS mi),
 dists AS (
   SELECT e.vec_id, mi.mi, c.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (e.v[mi.mi * 16 + i] - c.cv[mi.mi * 16 + i])
                   * (e.v[mi.mi * 16 + i] - c.cv[mi.mi * 16 + i]))), 6) AS d
   FROM e, mi, c),
 enc AS (
   SELECT vec_id, mi, j AS code FROM (
     SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                                  ORDER BY d, j) AS rn
     FROM dists) t
   WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
 qd AS (
   SELECT q.q_id, mi.mi, c.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (q.qv[mi.mi * 16 + i] - c.cv[mi.mi * 16 + i])
                   * (q.qv[mi.mi * 16 + i] - c.cv[mi.mi * 16 + i]))), 6) AS d
   FROM q, mi, c),
 ad AS (
   SELECT qd.q_id, enc.vec_id AS n_id, round(sum(qd.d), 6) AS approx_dist
   FROM enc JOIN qd ON qd.mi = enc.mi AND qd.j = enc.code
   WHERE enc.vec_id <> qd.q_id
   GROUP BY 1, 2)
SELECT q_id, n_id, approx_dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY approx_dist, n_id) AS rnk
  FROM ad) t
WHERE rnk <= 3
""",
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-3 (asymmetric distance): the
    ANN storage-compression path — corpus vectors become 4 sub-space
    code bytes (64x smaller than 64 doubles), queries measure against
    reconstructed centers. Encoding and ADC scoring are pure map-side
    literal-codebook expressions; the only shuffle is the per-query
    top-k window (operators/similarity.pq_topk). Codebook memoized per
    sf_dir like embedding_ivf_topk's."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )
    return similarity.pq_topk(
        emb, m=4, n_centers=4, query_mod=100, k=3, centers=centers
    )


@register(
    "embedding_ivfpq_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 cc AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
 pc AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < 4),
 mi AS (SELECT unnest([0, 1, 2, 3]) AS mi),
 csim AS (SELECT e.vec_id, cc.c_id,
                 {_COS.format(a='e.v', b='cc.cv')} AS sim
          FROM e CROSS JOIN cc),
 asn AS (SELECT vec_id, c_id AS cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, c_id) AS rn
           FROM csim) t
         WHERE rn = 1),
 dists AS (
   SELECT e.vec_id, mi.mi, pc.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (e.v[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i])
                   * (e.v[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i]))), 6) AS d
   FROM e, mi, pc),
 enc AS (
   SELECT vec_id, mi, j AS code FROM (
     SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                                  ORDER BY d, j) AS rn
     FROM dists) t
   WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
 qprobe AS (
   SELECT q_id, c_id AS q_cell FROM (
     SELECT q.q_id, cc.c_id,
            row_number() OVER (PARTITION BY q.q_id
                               ORDER BY {_COS.format(a='q.qv', b='cc.cv')}
                                        DESC, cc.c_id) AS rn
     FROM q CROSS JOIN cc) t
   WHERE rn <= 2),
 qd AS (
   SELECT q.q_id, mi.mi, pc.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (q.qv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i])
                   * (q.qv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i]))), 6) AS d
   FROM q, mi, pc),
 ad AS (
   SELECT qd.q_id, enc.vec_id AS n_id, CAST(asn.cell AS BIGINT) AS cell,
          round(sum(qd.d), 6) AS approx_dist
   FROM enc
   JOIN asn ON asn.vec_id = enc.vec_id
   JOIN qprobe ON qprobe.q_cell = asn.cell
   JOIN qd ON qd.q_id = qprobe.q_id AND qd.mi = enc.mi AND qd.j = enc.code
   WHERE enc.vec_id <> qd.q_id
   GROUP BY 1, 2, 3)
-- ADC_CTE_END (marker: _rerank_oracle composes everything above this line)
SELECT q_id, n_id, cell, approx_dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY approx_dist, n_id) AS rnk
  FROM ad) t
WHERE rnk <= 3
""",
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the composed 100 TB ANN search path (VERDICT r5 ask #1):
    queries probe their 2 nearest IVF cells and score ONLY those cells'
    PQ codes via asymmetric distance. Flat PQ (embedding_pq_topk) scans
    every code; IVF alone (embedding_ivf_topk) joins full vectors; this
    composition prunes candidates by cell AND compresses them 64×.
    Cell assignment, probe selection, and PQ encoding are all map-side
    literal-codebook expressions (operators/similarity.ivfpq_topk); the
    only shuffle is the final per-query top-k window. Both codebooks are
    memoized per sf_dir (train-once, query-many)."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )
    return similarity.ivfpq_topk(
        emb,
        n_cells=4, m=4, n_centers=4, query_mod=100, k=3, n_probe=2,
        cell_centroids=cells, centers=centers,
    )


def _ivfpq_oracle() -> str:
    from migrate_cassandra_to_mysql_spark.plans.registry import CATALOG

    return CATALOG["embedding_ivfpq_topk"].oracle


# ann_recall_eval: IR-metric evaluation of the IVFADC system list against
# the exact-cosine truth list, K deep. All metrics are exact integers
# (ppm / gain units) so cross-engine hashing never touches float sums:
# the only transcendental is log2 over the 10 FIXED rank positions,
# floored at 1e9 scale far from integer boundaries.
_EVAL_K = 10
_GAIN_SQL = (
    "CAST(floor(1000000000.0 / log2(CAST({r} AS DOUBLE) + 1.0)) AS BIGINT)"
)


def _ann_recall_eval_oracle() -> str:
    """The IVFADC oracle's CTE chain verbatim (ADC_CTE_END composition,
    single source of truth for codebook/probe semantics) supplies the
    system ranking; a brute-force cosine CTE supplies the truth; the
    final SELECT folds both into per-query recall/MRR/nDCG integers."""
    base = _ivfpq_oracle()
    marker = "-- ADC_CTE_END"
    if marker not in base:
        raise ValueError(
            "embedding_ivfpq_topk oracle lost its ADC_CTE_END marker — "
            "_ann_recall_eval_oracle can no longer compose the CTE chain"
        )
    cte_part = base.split(marker)[0]
    gain = _GAIN_SQL.format(r="srnk")
    return (
        cte_part
        + f""",
 sysr AS (SELECT q_id, n_id, srnk FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY approx_dist, n_id) AS srnk
   FROM ad) t
   WHERE srnk <= {_EVAL_K}),
 tsim AS (SELECT q.q_id, e.vec_id AS n_id,
                 {_COS.format(a='q.qv', b='e.v')} AS cos_sim
          FROM q CROSS JOIN e WHERE e.vec_id != q.q_id),
 truthr AS (SELECT q_id, n_id, trnk FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY cos_sim DESC, n_id) AS trnk
   FROM tsim) t
   WHERE trnk <= {_EVAL_K}),
 j AS (SELECT s.q_id, s.srnk, t.trnk, {gain} AS gain
       FROM sysr s LEFT JOIN truthr t
         ON s.q_id = t.q_id AND s.n_id = t.n_id),
 idcg AS (SELECT CAST(list_sum(list_transform(range(1, {_EVAL_K + 1}),
            r -> {_GAIN_SQL.format(r="r")})) AS BIGINT) AS idcg)
SELECT q_id,
       CAST(count(trnk) AS BIGINT) AS n_hits,
       CAST((count(trnk) * 1000000) // {_EVAL_K} AS BIGINT) AS recall_ppm,
       CAST(coalesce(max(CASE WHEN trnk = 1 THEN 1000000 // srnk END), 0)
            AS BIGINT) AS rr_ppm,
       CAST(sum(CASE WHEN trnk IS NOT NULL THEN gain ELSE 0 END)
            AS BIGINT) AS dcg,
       CAST((sum(CASE WHEN trnk IS NOT NULL THEN gain ELSE 0 END)
             * 1000000) // max(idcg.idcg) AS BIGINT) AS ndcg_ppm
FROM j CROSS JOIN idcg
GROUP BY q_id
"""
    )


# MMR diversified re-ranking constants (candidate depth / list size).
_MMR_N = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    """The greedy MMR loop UNROLLED as k-1 chained CTE stages — the
    literal SQL mirror of the Spark loop (no recursion: each stage is
    one max-aggregation over the previous selected set plus one
    window), with the shared lambda literal text so both engines
    compile the identical double expression."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        MMR_COMPLEMENT_SQL,
        MMR_LAMBDA_SQL,
    )

    head = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
 sims AS (SELECT q.q_id, e.vec_id AS n_id,
                 {_COS.format(a='q.qv', b='e.v')} AS rel
          FROM q CROSS JOIN e WHERE e.vec_id != q.q_id),
 cand AS (SELECT q_id, n_id, rel FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY rel DESC, n_id) AS rn
   FROM sims) t WHERE rn <= {_MMR_N}),
 pairs AS (SELECT a.q_id, a.n_id, b.n_id AS s_id,
                  {_COS.format(a='va.v', b='vb.v')} AS sim
           FROM cand a JOIN cand b
             ON a.q_id = b.q_id AND a.n_id != b.n_id
           JOIN e va ON va.vec_id = a.n_id
           JOIN e vb ON vb.vec_id = b.n_id),
 sel1 AS (SELECT q_id, n_id, rel, 1 AS step FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY rel DESC, n_id) AS rn
   FROM cand) t WHERE rn = 1),
 selall1 AS (SELECT * FROM sel1)"""
    stages = []
    for i in range(2, _MMR_K + 1):
        prev = f"selall{i - 1}"
        stages.append(f""",
 ms{i} AS (SELECT c.q_id, c.n_id, c.rel, max(p.sim) AS maxsim
   FROM cand c
   JOIN pairs p ON p.q_id = c.q_id AND p.n_id = c.n_id
   JOIN {prev} s ON s.q_id = p.q_id AND s.n_id = p.s_id
   WHERE NOT EXISTS (SELECT 1 FROM {prev} s2
                     WHERE s2.q_id = c.q_id AND s2.n_id = c.n_id)
   GROUP BY 1, 2, 3),
 sel{i} AS (SELECT q_id, n_id, rel, {i} AS step FROM (
   SELECT *, round({MMR_LAMBDA_SQL} * rel
                   - {MMR_COMPLEMENT_SQL} * maxsim, 6) AS mmr,
          row_number() OVER (PARTITION BY q_id
            ORDER BY round({MMR_LAMBDA_SQL} * rel
                           - {MMR_COMPLEMENT_SQL} * maxsim, 6) DESC,
                     n_id) AS rn
   FROM ms{i}) t WHERE rn = 1),
 selall{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM sel{i})""")
    tail = f"""
SELECT q_id, n_id, CAST(step AS BIGINT) AS step, rel
FROM selall{_MMR_K}
"""
    return head + "".join(stages) + tail


@register("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware result-list construction: MMR-rerank the exact
    cosine top-20 candidates of each query into a 5-item list where
    each greedy pick maximizes lambda*relevance minus (1-lambda)*max
    similarity to the already-picked items — the redundancy-control
    pass a RAG/retrieval stack runs so five near-identical chunks
    don't fill the context window (operators/similarity.mmr_rerank;
    Carbonell & Goldstein 1998).

    Scale shape: candidate generation is the pinned brute-force
    baseline over the query sample (queries broadcast, corpus never
    shuffles); everything after is bounded by N=20 per query — an
    N^2 candidate-pair self-join and an UNROLLED k-1-stage greedy
    loop (one anti-join + one max-agg + one window per stage, all
    bounded-by-N, the hybrid-RRF discipline). The oracle unrolls the
    identical loop as chained CTEs."""
    return similarity.mmr_rerank(
        T(spark, sf_dir, "embeddings"),
        F.col("vec_id") % 100 == 0,
        n_candidates=_MMR_N,
        k=_MMR_K,
    )


@register("ann_recall_eval", oracle=_ann_recall_eval_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION as a first-class operator: per query,
    recall@K, reciprocal rank of the true nearest neighbor, and binary-
    relevance nDCG@K of the IVFADC system list (the exact composition
    embedding_ivfpq_topk verifies) against the exact-cosine truth list.
    A production vector stack runs exactly this harness on every index /
    codebook / n_probe change — the recall ladder the ANN family's tests
    pin (tests/test_ann_recall.py) becomes a driver-verifiable query.

    Determinism: every metric is an exact integer — recall/MRR/nDCG in
    parts-per-million via integer DIV, DCG gains floored at 1e9 scale
    from log2 of the K fixed rank positions — so no float aggregation
    order can flip a hash (the jac_ppm discipline).

    Scale shape: the system side is the pinned IVFADC plan (map-side
    encode/probe, one top-K window). The truth side is brute-force ONLY
    over the evaluation query sample (queries broadcast, corpus never
    shuffles — eval cost scales with sample size, not corpus²; recall
    is always measured on a sample in production). The metric fold is
    one LEFT join of two K-row-per-query lists plus a per-query
    partial agg."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )
    sysr = similarity.ivfpq_topk(
        emb,
        n_cells=4, m=4, n_centers=4, query_mod=100, k=_EVAL_K, n_probe=2,
        cell_centroids=cells, centers=centers,
    ).select("q_id", "n_id", F.col("rnk").alias("srnk"))
    truthr = similarity.brute_force_topk(
        emb, F.col("vec_id") % 100 == 0, k=_EVAL_K
    ).select("q_id", "n_id", F.col("rnk").alias("trnk"))
    # the truth list is eval-sample x K rows — broadcast at any corpus
    # size (un-hinted, post-window stats made Catalyst sort-merge it)
    j = sysr.join(F.broadcast(truthr), ["q_id", "n_id"], "left").select(
        "q_id",
        "srnk",
        "trnk",
        F.expr(_GAIN_SQL.format(r="srnk")).alias("gain"),
    )
    idcg_expr = (
        f"aggregate(sequence(1, {_EVAL_K}), CAST(0 AS BIGINT), "
        f"(acc, r) -> acc + {_GAIN_SQL.format(r='r')})"
    )
    return (
        j.groupBy("q_id")
        .agg(
            F.count("trnk").cast("long").alias("n_hits"),
            F.expr(
                f"CAST((count(trnk) * 1000000) DIV {_EVAL_K} AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(coalesce(max(CASE WHEN trnk = 1 THEN "
                "1000000 DIV srnk END), 0) AS BIGINT)"
            ).alias("rr_ppm"),
            F.expr(
                "CAST(sum(CASE WHEN trnk IS NOT NULL THEN gain "
                "ELSE 0 END) AS BIGINT)"
            ).alias("dcg"),
            F.expr(
                "CAST((sum(CASE WHEN trnk IS NOT NULL THEN gain "
                f"ELSE 0 END) * 1000000) DIV ({idcg_expr}) AS BIGINT)"
            ).alias("ndcg_ppm"),
        )
    )


def _rerank_oracle(shortlist: int = 20, k: int = 3) -> str:
    """ADC-shortlist + exact-re-rank oracle, built on the IVFADC oracle's
    CTE chain (single source of truth for the codebook/encode/probe
    semantics): keep everything up to the `ad` scores, take the
    per-query ADC top-`shortlist`, then exact-cosine re-rank to top-k.

    The split anchors on the explicit ADC_CTE_END marker comment in the
    base oracle — splitting on final-SELECT text proved fragile (ADVICE
    r7: a harmless rewording silently truncated the derived SQL, failing
    only later at DuckDB parse time) — and raises HERE if the marker is
    gone."""
    base = _ivfpq_oracle()
    marker = "-- ADC_CTE_END"
    if marker not in base:
        raise ValueError(
            "embedding_ivfpq_topk oracle lost its ADC_CTE_END marker — "
            "_rerank_oracle can no longer compose the shared CTE chain"
        )
    cte_part = base.split(marker)[0]
    return (
        cte_part
        + f""",
 short AS (SELECT q_id, n_id FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY approx_dist, n_id) AS srnk
   FROM ad) t
   WHERE srnk <= {shortlist}),
 rr AS (SELECT s.q_id, s.n_id,
               {_COS.format(a='q.qv', b='e.v')} AS cos_sim
        FROM short s
        JOIN q ON q.q_id = s.q_id
        JOIN e ON e.vec_id = s.n_id)
SELECT q_id, n_id, cos_sim, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM rr) t
WHERE rnk <= {k}
"""
    )


@register(
    "embedding_ivfpq_residual_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 cc AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
 csim AS (SELECT e.vec_id, cc.c_id,
                 {_COS.format(a='e.v', b='cc.cv')} AS sim
          FROM e CROSS JOIN cc),
 asn AS (SELECT vec_id, c_id AS cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, c_id) AS rn
           FROM csim) t
         WHERE rn = 1),
 resid AS (SELECT e.vec_id, a.cell,
                  list_transform(range(1, 65), i -> e.v[i] - cc.cv[i]) AS rv
           FROM e
           JOIN asn a ON a.vec_id = e.vec_id
           JOIN cc ON cc.c_id = a.cell),
 pc AS (SELECT vec_id AS j, rv AS cv FROM resid WHERE vec_id < 4),
 mi AS (SELECT unnest([0, 1, 2, 3]) AS mi),
 dists AS (
   SELECT r.vec_id, mi.mi, pc.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (r.rv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i])
                   * (r.rv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i]))), 6) AS d
   FROM resid r, mi, pc),
 enc AS (
   SELECT vec_id, mi, j AS code FROM (
     SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                                  ORDER BY d, j) AS rn
     FROM dists) t
   WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
 qprobe AS (
   SELECT q_id, c_id AS q_cell FROM (
     SELECT q.q_id, cc.c_id,
            row_number() OVER (PARTITION BY q.q_id
                               ORDER BY {_COS.format(a='q.qv', b='cc.cv')}
                                        DESC, cc.c_id) AS rn
     FROM q CROSS JOIN cc) t
   WHERE rn <= 2),
 qresid AS (SELECT p.q_id, p.q_cell,
                   list_transform(range(1, 65), i -> q.qv[i] - cc.cv[i])
                     AS rqv
            FROM qprobe p
            JOIN q ON q.q_id = p.q_id
            JOIN cc ON cc.c_id = p.q_cell),
 qd AS (
   SELECT qr.q_id, qr.q_cell, mi.mi, pc.j,
          round(list_sum(list_transform(range(1, 17),
              i -> (qr.rqv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i])
                   * (qr.rqv[mi.mi * 16 + i] - pc.cv[mi.mi * 16 + i]))), 6)
            AS d
   FROM qresid qr, mi, pc),
 ad AS (
   SELECT qd.q_id, enc.vec_id AS n_id, CAST(asn.cell AS BIGINT) AS cell,
          round(sum(qd.d), 6) AS approx_dist
   FROM enc
   JOIN asn ON asn.vec_id = enc.vec_id
   JOIN qd ON qd.q_cell = asn.cell AND qd.mi = enc.mi AND qd.j = enc.code
   WHERE enc.vec_id <> qd.q_id
   GROUP BY 1, 2, 3)
SELECT q_id, n_id, cell, approx_dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY approx_dist, n_id) AS rnk
  FROM ad) t
WHERE rnk <= 3
""",
)
def embedding_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC-proper residual encoding (new r7): codes quantize
    x - centroid[cell(x)] and each probed cell scores the query's
    residual AGAINST THAT CELL — the Jégou 2011 §IV.B form whose payoff
    the clustered-fixture recall ladder measures (0.55 vs 0.37 raw at
    recall@5). The catalog form derives the PQ codebook from the first-K
    RESIDUAL sub-vectors so DuckDB can replay the identical pipeline:
    assignment, residuals, encoding, per-cell query residuals, and ADC
    all have SQL twins. Same plan shape as embedding_ivfpq_topk — the
    residual is one extra map-side zip_with on each side of the
    broadcast cell join."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        _base,
        _first_k_pq_centers,
        residual_frame,
    )
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_residual_centers", sf_dir),
        lambda: _first_k_pq_centers(_base(residual_frame(emb, cells)), 4, 4),
    )
    return similarity.ivfpq_topk(
        emb,
        n_cells=4, m=4, n_centers=4, query_mod=100, k=3, n_probe=2,
        cell_centroids=cells, centers=centers, residual=True,
    )


@register("embedding_rerank_topk", oracle=_rerank_oracle())
def embedding_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC shortlist + exact re-rank — the full production ANN serving
    composition (new r7): the compressed index proposes the per-query ADC
    top-20 (probe-pruned, code-only — the cheap pass over 100 TB), then
    ONLY those 20 candidates' full vectors are fetched and re-ranked by
    exact cosine to the final top-3. On the clustered fixture this
    recovers near-exact recall (0.94 with trained residual codebooks vs
    0.44 without re-rank quality — tests/test_ann_recall.py); here the
    catalog form uses the first-K codebooks so DuckDB can replay the
    identical shortlist. Scale shape: the shortlist (queries x 20 rows)
    broadcasts against the corpus scan for the vector fetch — the corpus
    itself never shuffles; the final window sorts queries x 20 rows
    (operators/similarity.ivfpq_rerank_topk)."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )
    return similarity.ivfpq_rerank_topk(
        emb,
        n_cells=4, m=4, n_centers=4, query_mod=100, k=3, n_probe=2,
        shortlist=20, cell_centroids=cells, centers=centers,
    )


@register("ivfpq_persisted_topk", oracle=_ivfpq_oracle())
def ivfpq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of embedding_ivfpq_topk (same oracle: the
    served path must be semantics-preserving): build the on-disk IVFADC
    layout ONCE — both codebooks + PQ codes hive-partitioned by IVF cell
    (operators/ivf_index.build_ivfpq_index) — then answer the same top-3
    queries reading ONLY the probed cells' code partitions (literal IN
    filter -> parquet PartitionFilters), scoring m-byte codes instead of
    full vectors. This is the production 100 TB vector-serving layout:
    probe pruning from IVF, 64× storage/IO compression from PQ, and the
    sole shuffle is the per-query top-k window."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )

    def _build() -> str:
        d = workdir("mc2m_ivfpq_")
        ivf_index.build_ivfpq_index(emb, d, cells, centers)
        return d

    index_dir = memo(("ivfpq_index", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ivf_index.ivfpq_search(spark, index_dir, queries, k=3, n_probe=2)


@register(
    "ivf_persisted_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
 c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
 scored AS (SELECT e.vec_id, e.v, c.c_id,
                   {_COS.format(a='e.v', b='c.cv')} AS c_sim
            FROM e CROSS JOIN c),
 asn AS (SELECT vec_id, v, c_id AS cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY c_sim DESC, c_id) AS rn
           FROM scored) t
         WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv, cell AS q_cell FROM asn
       WHERE vec_id % 100 = 0),
 cand AS (SELECT q.q_id, a.vec_id AS n_id, CAST(a.cell AS BIGINT) AS cell,
                 {_COS.format(a='q.qv', b='a.v')} AS cos_sim
          FROM q JOIN asn a ON a.cell = q.q_cell AND a.vec_id != q.q_id),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, n_id) AS rnk
            FROM cand)
SELECT q_id, n_id, cell, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of embedding_ivf_topk (same oracle: the
    served path must be semantics-preserving): build the index — codebook
    + corpus hive-partitioned by cell (operators/ivf_index.py) — then
    answer the same top-3 queries reading ONLY the probed cell partitions
    (literal IN filter -> parquet PartitionFilters). This is the train-
    once / query-many layout a 100 TB vector corpus needs; the inline
    variant above re-assigns cells on every query."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    emb = T(spark, sf_dir, "embeddings")

    def _build() -> str:
        # Train-once semantics for real: the index is built ONCE per
        # process per sf_dir (memoized, rmtree'd at exit) and every later
        # invocation runs only the pruned search — the production shape,
        # where queries never pay the build.
        d = workdir("mc2m_ivf_")
        ivf_index.build_ivf_index(emb, d, ivf_index.first_k_codebook(emb, 4))
        return d

    index_dir = memo(("ivf_index", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ivf_index.ivf_search(spark, index_dir, queries, k=3, n_probe=1)


@register(
    "label_centroids",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
 ex AS (SELECT label, u.pos AS pos, u.val AS val
        FROM e, (SELECT unnest(v) AS val,
                        generate_subscripts(v, 1) AS pos) u),
 m AS (SELECT label, pos, round(sum(val) / count(*), 6) AS mean_val,
              count(*) AS n
       FROM ex GROUP BY label, pos)
SELECT label, pos, mean_val, n FROM m
""",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed element-wise vector mean per label — the centroid-update
    step of k-means / IVF codebook training. posexplode turns the vector
    column into (label, pos, val) rows so the mean is an ordinary
    partial-aggregated groupBy: no driver-side vector math, scales to any
    corpus. Output kept in exploded (label, pos) form — reassembling
    arrays is a display concern."""
    e = T(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("pos0", "val")).select(
        "label", (F.col("pos0") + 1).alias("pos"), "val"
    )
    return ex.groupBy("label", "pos").agg(
        F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("mean_val"),
        F.count(F.lit(1)).alias("n"),
    )


# SQ8 scalar quantization: per-dimension corpus min/max -> each
# component stored as one byte q = floor(255 * (x - mn) / rng + 0.5),
# served by scoring queries (full precision) against the RECONSTRUCTED
# vectors mn + q * rng / 255. The floor(+0.5) form is deliberate: both
# engines share the exact text, sidestepping round-half rounding-mode
# differences; q is then integral and bit-identical across engines, so
# only the final cosine fold can differ (ulp, absorbed by round 6 —
# the module-header discipline).
_SQ8_QUANT_SQL = (
    "CASE WHEN {rng} = 0.0 THEN 0.0"
    " ELSE floor(255.0 * ({x} - {mn}) / {rng} + 0.5) END"
)


@register(
    "sq8_quantized_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
 ex AS (SELECT e.vec_id, u.pos, u.val
        FROM e, (SELECT unnest(v) AS val,
                        generate_subscripts(v, 1) AS pos) u),
 d AS (SELECT pos, min(val) AS mn, max(val) - min(val) AS rng
       FROM ex GROUP BY pos),
 r AS (SELECT ex.vec_id, ex.pos,
              d.mn + ({_SQ8_QUANT_SQL.format(x='ex.val', mn='d.mn',
                                             rng='d.rng')})
                     * d.rng / 255.0 AS rv
       FROM ex JOIN d USING (pos)),
 recon AS (SELECT vec_id, list(rv ORDER BY pos) AS rvec
           FROM r GROUP BY vec_id),
 q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
 sims AS (SELECT q.q_id, rc.vec_id AS n_id,
                 {_COS.format(a='q.qv', b='rc.rvec')} AS cos_sq
          FROM q JOIN recon rc ON rc.vec_id != q.q_id),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY cos_sq DESC, n_id) AS rnk
            FROM sims)
SELECT q_id, n_id, cos_sq, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def sq8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized top-5: per-dimension corpus min/max train a
    uint8 scalar quantizer (the SQ member of the quantization family —
    PQ/IVFPQ trade accuracy for memory via codebooks, SQ8 via 4x
    per-component narrowing with NO codebook), queries score against
    the reconstructed vectors. The oracle replays quantize+reconstruct
    per (vec_id, pos) and must match exactly: the quantized codes are
    integral and bit-identical across engines (shared floor(+0.5)
    text), so this row pins the full train -> encode -> serve loop.

    Scale shape: the per-dimension min/max "training" is posexplode +
    groupBy(pos) with map-side partial aggregation — shuffle volume is
    partitions x dim rows (KBs), never the corpus; the 2x64-double
    stats row broadcasts back and encode/reconstruct are pure map-side
    zip_with chains (at 100 TB you persist qcode as a byte array — 4x
    smaller scans — and keep the mins/rngs sidecar with the index
    manifest; reconstruction happens on scan, never a second shuffle).
    Queries broadcast against the corpus exactly like
    embedding_topk_cosine; the only wide op is the per-query rank.
    """
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("vec_id", F.posexplode("v").alias("pos0", "val"))
    dims = ex.groupBy("pos0").agg(
        F.min("val").alias("mn"),
        (F.max("val") - F.min("val")).alias("rng"),
    )
    stats = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "mn"))),
            lambda s: s.mn,
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "rng"))),
            lambda s: s.rng,
        ).alias("rngs"),
    )
    quant = _SQ8_QUANT_SQL.format(x="p.x", mn="p.mn", rng="rng")
    recon = (
        e.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.expr(
                "zip_with(zip_with(v, mins, (x, mn) -> struct(x, mn)),"
                f" rngs, (p, rng) -> p.mn + ({quant}) * rng / 255.0)"
            ).alias("rvec"),
        )
    )
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(recon)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(cosine(F.col("qv"), F.col("rvec")), 6).alias("cos_sq"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sq"), F.asc("n_id"))
    return sims.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= 5
    )


def _lsh_oracle(n_planes: int = 8, dim: int = 64) -> str:
    """Oracle for embedding_lsh_candidates, generated from the SAME plane
    literals the Spark operator embeds (similarity.hyperplane_planes)."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        hyperplane_planes,
    )

    bits = []
    for row in hyperplane_planes(n_planes, dim):
        arr = "[" + ", ".join(f"({n}/1000.0)" for n in row) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN '1' ELSE '0' END)"
        )
    key = " || ".join(bits)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 b AS (SELECT vec_id, v, {key} AS bucket_key FROM e)
SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket_key,
       {_COS.format(a='a.v', b='c.v')} AS cos_sim
FROM b a JOIN b c ON a.bucket_key = c.bucket_key AND a.vec_id < c.vec_id
"""


@register("embedding_lsh_candidates", oracle=_lsh_oracle())
def embedding_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup blocking with NO label column: sign
    bits of 8 fixed md5-derived planes form the bucket key; same-bucket
    pairs are the candidates (expected bucket N/256). The oracle embeds
    the identical plane literals, so bucketing AND pair cosines must match
    bit-for-bit."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        lsh_candidate_pairs,
    )

    return lsh_candidate_pairs(T(spark, sf_dir, "embeddings"), n_planes=8, dim=64)


@register(
    "embedding_near_dup",
    oracle=f"""
SELECT id_a, id_b, bucket_key, cos_sim
FROM ({_lsh_oracle()}) t
WHERE cos_sim >= 0.4
""",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4) blocked by the
    random-hyperplane LSH bucket key — NO metadata/label blocking (r2
    VERDICT #5 / ADVICE: a popular label value makes a label-blocked
    self-join quadratic per block at scale, while LSH buckets stay
    ~N/2^n_planes regardless of metadata skew). Candidates come from the
    same-bucket equi-join; the cosine threshold then verifies each pair.
    The label-blocked form remains in operators/similarity.near_dup_pairs
    for corpora with a known-fine blocking column, but the catalog path —
    and the scale path — is this one."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        lsh_candidate_pairs,
    )

    return lsh_candidate_pairs(
        T(spark, sf_dir, "embeddings"), n_planes=8, dim=64
    ).where(F.col("cos_sim") >= 0.4)


def _kmeans_oracle(k: int = 4, n_iter: int = 3) -> str:
    """Unrolled Lloyd-iteration SQL twin of operators/kmeans.kmeans with
    first-k init. Every step mirrors the Spark operator's deterministic
    arithmetic (module doc there): rounded dot-combination distances,
    FLOOR(val*1e9) quantized means rounded to 4 dp, (d2, c_id) argmin."""
    d2 = (
        "round(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)"
        " + list_dot_product(c.cv, c.cv), 6)"
    )
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(1, n_iter + 1):
        prev, cur = f"c{i - 1}", f"c{i}"
        ctes.append(f"""a{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.c_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2} ASC, c.c_id ASC) AS rn
    FROM e CROSS JOIN {prev} c) t
  WHERE rn = 1)""")
        ctes.append(f"""u{i} AS (
  SELECT cell AS c_id, list(mv ORDER BY pos) AS cv FROM (
    SELECT cell, pos, round(CAST(sum(q) AS DOUBLE) / (1e9 * count(*)), 4) AS mv
    FROM (SELECT cell, u.pos AS pos, floor(u.val * 1e9) AS q
          FROM a{i}, (SELECT unnest(v) AS val,
                             generate_subscripts(v, 1) AS pos) u) qv
    GROUP BY cell, pos) m
  GROUP BY cell)""")
        ctes.append(
            f"{cur} AS (SELECT * FROM u{i} UNION ALL "
            f"SELECT c_id, cv FROM {prev} WHERE c_id NOT IN (SELECT c_id FROM u{i}))"
        )
    final = f"""fin AS (
  SELECT vec_id, cell AS cluster FROM (
    SELECT e.vec_id, c.c_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2} ASC, c.c_id ASC) AS rn
    FROM e CROSS JOIN c{n_iter} c) t
  WHERE rn = 1)"""
    ctes.append(final)
    return (
        "WITH " + ",\n ".join(ctes) + "\nSELECT vec_id, cluster FROM fin"
    )


@register("kmeans_clusters", oracle=_kmeans_oracle())
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (operators/kmeans.py), 3 Lloyd iterations, k=4,
    first-k init. The operator's arithmetic is cross-engine deterministic
    (quantized-integer centroid means, rounded distances), so the full
    iterative algorithm is differentially tested against a generated
    3-iteration unrolled SQL twin. Inertia/initialization invariants are
    additionally pinned in tests/test_kmeans.py. Returns (vec_id, cluster)
    assignments."""
    from migrate_cassandra_to_mysql_spark.operators.kmeans import kmeans

    assigned, _ = kmeans(T(spark, sf_dir, "embeddings"), k=4, n_iter=3)
    return assigned.select("vec_id", "cluster")


@register(
    "multimodal_meta",
    oracle="""
WITH b AS (SELECT doc_id, encode(text) AS payload, source FROM documents)
SELECT doc_id, source,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CAST(octet_length(payload) % 640 AS BIGINT) AS fake_width,
       CAST(octet_length(payload) % 480 AS BIGINT) AS fake_height,
       CASE WHEN octet_length(payload) % 3 = 0 THEN 'png'
            WHEN octet_length(payload) % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END AS fake_format
FROM b
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: text -> binary payload column, then typed
    metadata extraction with pure column expressions (byte length plus
    length-derived pseudo-metadata — the columnar fast path next to the
    real header-parsing mapInPandas pipeline in operators/multimodal.py)."""
    d = T(spark, sf_dir, "documents")
    b = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "source"
    )
    nb = F.length("payload").cast("long")
    return b.select(
        "doc_id",
        "source",
        nb.alias("n_bytes"),
        (nb % 640).alias("fake_width"),
        (nb % 480).alias("fake_height"),
        F.when(nb % 3 == 0, "png")
        .when(nb % 3 == 1, "jpeg")
        .otherwise("webp")
        .alias("fake_format"),
    )


def _multimodal_suite_oracle() -> str:
    from migrate_cassandra_to_mysql_spark.plans.registry import CATALOG

    d = CATALOG["multimodal_decode"].oracle
    m = CATALOG["multimodal_meta"].oracle
    return f"""
SELECT d.doc_id, d.n_bytes, d.width, d.height, d.format, d.hist,
       m.source, m.n_bytes AS meta_n_bytes,
       m.fake_width, m.fake_height, m.fake_format
FROM ({d}) d
JOIN ({m}) m ON d.doc_id = m.doc_id
"""


@register("multimodal_suite", oracle=_multimodal_suite_oracle())
def multimodal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both multimodal paths — the Arrow-batched mapInPandas decode
    pipeline (plans/textplans.multimodal_decode) and the pure-column
    metadata extraction (multimodal_meta) — joined on doc_id into one
    wide row per asset, giving each a driver-verified row through one
    catalog slot. The decode parses real PNG IHDR / JPEG SOF0 container
    headers byte-for-byte (operators/multimodal.py); only pixel-codec
    work stays out of scope in this environment."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        multimodal_decode,
    )

    d = multimodal_decode(spark, sf_dir)
    m = (
        multimodal_meta(spark, sf_dir)
        .withColumnRenamed("n_bytes", "meta_n_bytes")
    )
    return d.join(m, "doc_id")


def _jl_signs(in_dim: int = 64, out_dim: int = 16) -> list[tuple[int, int, int]]:
    """Deterministic +-1 Johnson-Lindenstrauss sign matrix, derived from
    md5 so both engines inline the IDENTICAL literal matrix (computed once
    at import; no RNG, no seed state)."""
    import hashlib

    return [
        (
            i,
            j,
            1
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1,
        )
        for i in range(in_dim)
        for j in range(out_dim)
    ]


_JL = _jl_signs()


@register(
    "random_projection",
    oracle=f"""
WITH m(pos, out_dim, sign) AS (
  VALUES {",".join(f"({i},{j},{s})" for i, j, s in _JL)}),
 e AS (SELECT vec_id,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e9) AS BIGINT)
                AS q,
              generate_subscripts(embedding, 1) - 1 AS pos
       FROM embeddings)
SELECT e.vec_id, CAST(m.out_dim AS INTEGER) AS out_dim,
       CAST(CAST(sum(CASE WHEN m.sign = 1 THEN q ELSE -q END) AS DOUBLE)
            / 1e9 AS DOUBLE) AS proj
FROM e JOIN m ON e.pos = m.pos
GROUP BY e.vec_id, m.out_dim
""",
)
def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 -> 16 dims with
    a +-1 sign matrix (Achlioptas 2001's database-friendly projection):
    the md5-derived matrix is a 1024-row broadcast dimension, embeddings
    posexplode to (vec_id, pos, v), and each output dim is one
    partial-aggregated sum of signed components — map-side combine
    reduces each vector to 16 rows before the exchange, so the shuffle
    carries out_dim/in_dim (=1/4) of the embedding volume. Components
    are FLOOR-quantized to exact 1e-9 integers (the operators/kmeans.py
    discipline), summed exactly, and divided back once — keeping the
    result independent of Spark's float-add order AND of the engines'
    decimal-cast tie rules: the earlier DECIMAL(20,9) cast rounded
    exact .5e-9 ties differently in Spark (half-up) and DuckDB, which
    surfaced as 16/32000 values off by 1e-9 at sf0.1 (floats that are
    coarse dyadic rationals terminate exactly on the tie; floor has no
    ties). At 100 TB this is the standard ANN pre-step: project,
    bucket/index in the low-dim space, verify in the original space."""
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    )
    m = local_frame(spark, _JL, "pos INT, out_dim INT, sign INT")
    q = F.floor(F.col("v").cast("double") * F.lit(1000000000.0))
    signed = F.when(F.col("sign") == 1, q).otherwise(-q)
    return (
        e.join(F.broadcast(m), "pos")
        .groupBy("vec_id", "out_dim")
        .agg(
            (F.sum(signed).cast("double") / F.lit(1e9)).alias("proj")
        )
    )


@register("ivfpq_persisted_rerank_topk", oracle=_rerank_oracle())
def ivfpq_persisted_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of embedding_rerank_topk (same oracle —
    the served composition must be semantics-preserving, new r9): the
    ADC shortlist comes from the ON-DISK codes (probed cells only, via
    parquet PartitionFilters), and only the shortlisted candidates'
    full vectors are fetched from the corpus for the exact-cosine
    re-rank (operators/ivf_index.ivfpq_search_rerank). This is the
    complete 100 TB serving path end to end: compressed probe-pruned
    index read -> broadcastable shortlist -> corpus fetch that never
    shuffles the corpus -> queries x shortlist top-k window. Shares the
    memoized index build with ivfpq_persisted_topk (one build serves
    both rows, as in production)."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )

    def _build() -> str:
        d = workdir("mc2m_ivfpq_")
        ivf_index.build_ivfpq_index(emb, d, cells, centers)
        return d

    index_dir = memo(("ivfpq_index", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ivf_index.ivfpq_search_rerank(
        spark, index_dir, queries, corpus=emb, k=3, n_probe=2, shortlist=20
    )


# Serving-time metadata filter for the filtered-ANN row: labels
# {0,3,6,9}, ~42% selective — the "tenant/class slice" predicate shape.
_FILTER_LABEL_MOD, _FILTER_LABEL_RES = 3, 0


def _filtered_rerank_oracle(shortlist: int = 20, k: int = 3) -> str:
    """The FILTERED shortlist+re-rank oracle: the IVFADC CTE chain up to
    the `ad` scores (same ADC_CTE_END-marker composition as
    _rerank_oracle — single source of truth for codebook/encode/probe
    semantics), then a PRE-shortlist restriction of candidates to the
    allowed label set, then the per-query ADC top-`shortlist` and exact
    re-rank. Filtering before the shortlist cut is the semantics the
    Spark path implements (codes semi-join before ADC scoring): a
    selective filter still yields k results instead of starving a
    post-filtered fixed-k list."""
    base = _ivfpq_oracle()
    marker = "-- ADC_CTE_END"
    if marker not in base:
        raise ValueError(
            "embedding_ivfpq_topk oracle lost its ADC_CTE_END marker — "
            "_filtered_rerank_oracle can no longer compose the CTE chain"
        )
    cte_part = base.split(marker)[0]
    return (
        cte_part
        + f""",
 adf AS (SELECT ad.* FROM ad
         WHERE n_id IN (SELECT vec_id FROM embeddings
                        WHERE label % {_FILTER_LABEL_MOD}
                              = {_FILTER_LABEL_RES})),
 short AS (SELECT q_id, n_id FROM (
   SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY approx_dist, n_id) AS srnk
   FROM adf) t
   WHERE srnk <= {shortlist}),
 rr AS (SELECT s.q_id, s.n_id,
               {_COS.format(a='q.qv', b='e.v')} AS cos_sim
        FROM short s
        JOIN q ON q.q_id = s.q_id
        JOIN e ON e.vec_id = s.n_id)
SELECT q_id, n_id, cos_sim, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM rr) t
WHERE rnk <= {k}
"""
    )


@register("ivfpq_filtered_rerank_topk", oracle=_filtered_rerank_oracle())
def ivfpq_filtered_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN over the persisted IVFADC index: the
    ivfpq_persisted_rerank_topk serving composition restricted at query
    time to an allowed metadata slice (label % 3 = 0 here — a tenant /
    class / licence predicate in production). Pre-filtering: the
    allowed-id set left-semi-joins onto the probed codes scan BEFORE
    ADC scoring (operators/ivf_index.ivfpq_search), so the shortlist is
    drawn from admitted candidates only and a selective filter still
    returns k hits — the filtered-search semantics every production
    vector store exposes, vs post-filtering a fixed-k list to <k rows.

    Scale shape: probed-cells PartitionFilters first, ONE broadcast
    semi-join second (cost O(probed ∩ allowed)), then the unchanged
    shortlist-broadcast + corpus-fetch re-rank — the corpus never
    shuffles and the filter set comes from a pruned metadata scan.
    Shares the memoized index build with the other persisted rows: one
    index serves filtered and unfiltered queries alike (filtering is a
    query-time predicate, not an index variant)."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )

    def _build() -> str:
        d = workdir("mc2m_ivfpq_")
        ivf_index.build_ivfpq_index(emb, d, cells, centers)
        return d

    index_dir = memo(("ivfpq_index", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    allowed = emb.where(
        F.col("label") % _FILTER_LABEL_MOD == _FILTER_LABEL_RES
    ).select("vec_id")
    return ivf_index.ivfpq_search_rerank(
        spark,
        index_dir,
        queries,
        corpus=emb,
        k=3,
        n_probe=2,
        shortlist=20,
        allowed=allowed,
    )


def _ivfpq_tombstone_oracle() -> str:
    """The IVFADC oracle with the tombstone victims excluded from the
    CANDIDATE side only (codebooks and cell assignment are frozen — a
    deletion removes candidates, never retrains; queries come from the
    embeddings table, not the index). Splices the exclusion into the
    `ad` CTE's self-exclusion clause and raises loudly if that anchor
    text ever changes (the _rerank_oracle anchor discipline)."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _TOMBSTONE_MOD,
        _TOMBSTONE_RESIDUE,
    )

    base = _ivfpq_oracle()
    anchor = "WHERE enc.vec_id <> qd.q_id"
    if anchor not in base:
        raise ValueError(
            "embedding_ivfpq_topk oracle lost its candidate "
            "self-exclusion anchor - _ivfpq_tombstone_oracle can no "
            "longer splice the deletion predicate"
        )
    return base.replace(
        anchor,
        anchor
        + f" AND enc.vec_id % {_TOMBSTONE_MOD} <> {_TOMBSTONE_RESIDUE}",
    )


@register("ivfpq_tombstone_topk", oracle=_ivfpq_tombstone_oracle())
def ivfpq_tombstone_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ivfpq_persisted_topk through the DELETION lifecycle: build the
    persisted IVFADC index, delete_vectors the deterministic ~1% victim
    slice (ids % 97 == 13 — disjoint from the % 100 == 0 query set),
    then serve the same top-3 ADC queries. The oracle is the IVFADC SQL
    with the victims excluded as candidates — i.e. served neighbors must
    equal an index rebuilt without them under the SAME frozen codebooks,
    which is the tombstone contract (operators/ivf_index.delete_vectors:
    manifest-committed tombstone layer, broadcast anti-join at serve
    time, physical purge + layer reset riding the next compact_codes;
    lifecycle pinned in tests/test_ivf_index.py).

    Scale shape: identical to ivfpq_persisted_topk — probed-cell
    PartitionFilters, m-byte codes — plus one broadcast anti-join on the
    deletion-sized tombstone set; delete cost is O(tombstones), no cell
    rewrite, no retrain."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _TOMBSTONE_MOD,
        _TOMBSTONE_RESIDUE,
    )

    emb = T(spark, sf_dir, "embeddings")
    cells = memo(
        ("ivfpq_cells", sf_dir),
        lambda: similarity.first_k_cell_centroids(emb, 4),
    )
    centers = memo(
        ("pq_centers", sf_dir),
        lambda: similarity.first_k_pq_centers(emb, 4, 4),
    )

    def _build() -> str:
        d = workdir("mc2m_ivfpq_del_")
        ivf_index.build_ivfpq_index(emb, d, cells, centers)
        ivf_index.delete_vectors(
            spark,
            d,
            emb.select("vec_id").where(
                F.col("vec_id") % _TOMBSTONE_MOD == _TOMBSTONE_RESIDUE
            ),
        )
        return d

    index_dir = memo(("ivfpq_index_tombstone", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ivf_index.ivfpq_search(spark, index_dir, queries, k=3, n_probe=2)


# Reciprocal-rank fusion (Cormack et al., SIGIR 2009): k=60 is the
# published constant. The expression is shared VERBATIM by the Spark
# plan and the DuckDB oracle so both engines evaluate the identical
# IEEE tree (integer rank + double division; the final round pins any
# representation edge).
_RRF_SQL = (
    "round(coalesce(CAST(1 AS DOUBLE) / (60 + lex_rnk), CAST(0 AS DOUBLE))"
    " + coalesce(CAST(1 AS DOUBLE) / (60 + sem_rnk), CAST(0 AS DOUBLE)), 8)"
)


def _hybrid_oracle() -> str:
    from migrate_cassandra_to_mysql_spark.plans.textplans import _bm25_oracle

    return f"""
WITH lex AS (SELECT doc_id,
                    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                         AS BIGINT) AS lex_rnk
             FROM ({_bm25_oracle()}) b),
 e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
 sims AS (SELECT e.vec_id AS doc_id, {_COS.format(a='qv', b='e.v')} AS cos_sim
          FROM e, q WHERE e.vec_id != 0),
 sem AS (SELECT doc_id, CAST(rnk AS BIGINT) AS sem_rnk FROM (
           SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                  AS rnk
           FROM sims) s
         WHERE rnk <= 20),
 fused AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                  lex_rnk, sem_rnk
           FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
SELECT doc_id, lex_rnk, sem_rnk, {_RRF_SQL} AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@register("hybrid_rrf_search", oracle=_hybrid_oracle())
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    top-20 (the catalog's fixed 4-term query over `documents`) with the
    exact-cosine top-20 for query vector 0 over `embeddings`, fused as
    sum(1 / (60 + rank)) per retrieval system and returned as the
    overall top-10 — the standard two-tower serving composition a
    curation pipeline uses when neither lexical nor semantic retrieval
    alone is trustworthy (RRF needs no score calibration, only ranks,
    which is why it survives heterogeneous scorers).

    Scale shape: each leg keeps its own contract — the BM25 leg is two
    corpus scans with a broadcast 1-row stats join and a TakeOrdered
    top-k (bm25_topk_search, which this row's oracle embeds verbatim as
    its `lex` CTE); the cosine leg broadcasts the single query vector
    and never shuffles the corpus (operators/similarity.brute_force_
    topk). Fusion itself touches only the two top-k outputs (<= 2k
    rows): the full-outer rank join and the final ordering are
    control-plane sized no matter the corpus size, so hybrid serving
    costs max(leg costs) + O(k) at 100 TB. The single-partition
    row_number over the 20-row lexical leg is deliberate (bounded by k,
    not by data)."""
    from pyspark.sql.window import Window

    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        bm25_topk_search,
    )

    lex = bm25_topk_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("lex_rnk"),
    )
    sem = similarity.brute_force_topk(
        T(spark, sf_dir, "embeddings"), F.col("vec_id") == 0, k=20
    ).select(F.col("n_id").alias("doc_id"), F.col("rnk").alias("sem_rnk"))
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rnk",
            "sem_rnk",
            F.expr(_RRF_SQL).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


# Matryoshka truncation evaluation: prefix dims evaluated against the
# full-dim exact ranking. MRL-style embeddings front-load information
# into leading dimensions so a serving stack can trade dims for cost;
# the acceptance question is "how much of the full-dim top-k does a
# d-dim prefix keep" — answered here with all-integer metrics.
_MAT_DIMS = (16, 32)
_MAT_FULL = 64
_MAT_K = 10


def _mat_cos(d: int, a: str = "q.qv", b: str = "e.v") -> str:
    sa, sb = f"{a}[1:{d}]", f"{b}[1:{d}]"
    return (
        f"round(list_dot_product({sa}, {sb}) / "
        f"(sqrt(list_dot_product({sa}, {sa}))"
        f" * sqrt(list_dot_product({sb}, {sb}))), 6)"
    )


def _matryoshka_oracle() -> str:
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "q AS (SELECT vec_id AS q_id, v AS qv FROM e"
        " WHERE vec_id % 100 = 0)",
    ]
    for d in (*_MAT_DIMS, _MAT_FULL):
        ctes.append(
            f"""r{d} AS (
   SELECT q_id, n_id, rnk FROM (
     SELECT q.q_id, e.vec_id AS n_id,
            row_number() OVER (PARTITION BY q.q_id
                               ORDER BY {_mat_cos(d)} DESC, e.vec_id)
              AS rnk
     FROM q JOIN e ON e.vec_id != q.q_id) t
   WHERE rnk <= {_MAT_K})"""
        )
    overlaps = "\n  UNION ALL\n  ".join(
        f"""SELECT CAST({d} AS BIGINT) AS trunc_dim, t.q_id,
         CAST(count(*) AS BIGINT) AS n_overlap,
         CAST(max(CASE WHEN t.rnk = 1 AND s.rnk = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS top1_match
  FROM r{_MAT_FULL} t JOIN r{d} s
    ON t.q_id = s.q_id AND t.n_id = s.n_id
  GROUP BY t.q_id"""
        for d in _MAT_DIMS
    )
    dims_list = ", ".join(str(d) for d in _MAT_DIMS)
    return (
        "WITH "
        + ",\n ".join(ctes)
        + f""",
 ov AS (
  {overlaps}),
 base AS (SELECT q_id, CAST(unnest([{dims_list}]) AS BIGINT) AS trunc_dim
          FROM q)
SELECT b.q_id, b.trunc_dim,
       coalesce(o.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
       CAST(coalesce(o.n_overlap, 0) * 1000000 // {_MAT_K} AS BIGINT)
         AS recall_ppm,
       coalesce(o.top1_match, CAST(0 AS BIGINT)) AS top1_match
FROM base b LEFT JOIN ov o
  ON b.q_id = o.q_id AND b.trunc_dim = o.trunc_dim
ORDER BY b.trunc_dim, b.q_id
"""
    )


@register("matryoshka_ann_eval", oracle=_matryoshka_oracle())
def matryoshka_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation acceptance eval: for each query and
    each prefix width d in (16, 32), how much of the FULL-64d exact
    cosine top-10 does the d-dim prefix ranking keep — per-query
    overlap count, recall@10 in exact ppm, and whether the top-1
    neighbor survives. This is the dimension-vs-quality acceptance
    harness a serving stack runs before switching its shortlist stage
    to truncated vectors (the Matryoshka Representation Learning
    deployment pattern: score coarse on a prefix, refine on the full
    vector) — the truncation counterpart of ann_recall_eval (which
    grades IVFADC against the same kind of truth list).

    Scale shape: ONE brute-force pass computes every prefix cosine —
    the corpus joins the broadcast query set exactly once and all
    three widths evaluate per-row in that single join (slicing the
    SAME stored vector; no re-embedding, matching how MRL serving
    reads one index) — then each width is a per-query
    WindowGroupLimit top-{k} over the already-scored frame (the scored
    frame is eagerly checkpointed: three rankings reference it). The
    metric joins touch only {k}-row lists per query. The corpus frame
    itself is checkpointed once after the cast (query pick + join
    would otherwise re-scan the parquet). The documented eval-sample
    brute-force contract, same as ann_recall_eval.

    Determinism: cosines round to 6 dp with (sim DESC, id) total-order
    tie-breaks; every metric is an exact integer (ppm via
    non-negative integer division, identical in both engines)."""
    from pyspark.sql.window import Window

    from migrate_cassandra_to_mysql_spark.functions.vectors import (
        cosine,
        to_double_array,
    )

    e = (
        T(spark, sf_dir, "embeddings")
        .select("vec_id", to_double_array(F.col("embedding")).alias("v"))
        .localCheckpoint(eager=True)
    )
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    sims = (
        q.join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            *[
                F.round(
                    cosine(
                        F.slice(F.col("qv"), 1, d),
                        F.slice(F.col("v"), 1, d),
                    ),
                    6,
                ).alias(f"cos_{d}")
                for d in (*_MAT_DIMS, _MAT_FULL)
            ],
        )
        .localCheckpoint(eager=True)
    )

    def ranked(d: int):
        w = Window.partitionBy("q_id").orderBy(
            F.desc(f"cos_{d}"), F.asc("n_id")
        )
        return (
            sims.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= _MAT_K)
            .select("q_id", "n_id", "rnk")
        )

    full = ranked(_MAT_FULL)
    parts = []
    for d in _MAT_DIMS:
        s = ranked(d).select(
            F.col("q_id").alias("s_qid"),
            F.col("n_id").alias("s_nid"),
            F.col("rnk").alias("s_rnk"),
        )
        # Both ranking lists are eval-sample x K rows by contract (the
        # same bound ann_recall_eval's truth broadcast leans on), but
        # they come off checkpoint scans with no size statistics, so
        # Catalyst planned this metric join SORT-MERGE — two exchanges
        # + two sorts for a couple hundred rows (r15, guide §3.1).
        ov = (
            full.join(
                F.broadcast(s),
                (F.col("q_id") == F.col("s_qid"))
                & (F.col("n_id") == F.col("s_nid")),
            )
            .groupBy("q_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_overlap"),
                F.max(
                    F.when(
                        (F.col("rnk") == 1) & (F.col("s_rnk") == 1), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("top1_match"),
            )
            .select(
                F.lit(d).cast("long").alias("trunc_dim"),
                "q_id",
                "n_overlap",
                "top1_match",
            )
        )
        parts.append(ov)
    ov_all = parts[0].unionByName(parts[1])
    base = q.select("q_id").crossJoin(
        spark.range(1).select(
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in _MAT_DIMS])
            ).alias("trunc_dim")
        )
    )
    return (
        base.join(F.broadcast(ov_all), ["q_id", "trunc_dim"], "left")
        .select(
            "q_id",
            "trunc_dim",
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias(
                "n_overlap"
            ),
            F.expr(
                f"CAST(coalesce(n_overlap, 0) * 1000000 DIV {_MAT_K}"
                " AS BIGINT)"
            ).alias("recall_ppm"),
            F.coalesce(F.col("top1_match"), F.lit(0).cast("long")).alias(
                "top1_match"
            ),
        )
        .orderBy("trunc_dim", "q_id")
    )


# Binary (sign) quantization: 64 dims -> 64 bits packed as two BIGINT
# words (32 low dims, 32 high — bit 63 of a single word would overflow
# signed BIGINT). The packing is pure integer construction off exact
# float comparisons (v[i] >= 0), so codes are bit-identical
# cross-engine with no rounding discipline needed; only the final
# rerank cosine needs the usual round-6.
_BQ_SHORTLIST = 30
_BQ_K = 5


def _bq_pack_duck(v: str, lo: int) -> str:
    """DuckDB: word of bits lo..lo+31 of the sign pattern of `v`."""
    return (
        f"CAST(list_sum(list_transform(range(1, 33), i -> "
        f"CASE WHEN {v}[i + {lo}] >= 0 THEN (CAST(1 AS BIGINT) << (i - 1))"
        f" ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


def _bq_pack_spark(v: str, lo: int) -> str:
    """Spark SQL twin of _bq_pack_duck (element_at is 1-based too) —
    shared with the persisted-index builder (r13)."""
    from migrate_cassandra_to_mysql_spark.functions.vectors import (
        bq_pack_sql,
    )

    return bq_pack_sql(v, lo)


def _bq_oracle() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 codes AS (SELECT vec_id, v,
                  {_bq_pack_duck('v', 0)} AS w1,
                  {_bq_pack_duck('v', 32)} AS w2
           FROM e),
 q AS (SELECT vec_id AS q_id, v AS qv, w1 AS qw1, w2 AS qw2
       FROM codes WHERE vec_id % 100 = 0),
 ham AS (SELECT q.q_id, c.vec_id AS n_id, c.v,
                CAST(bit_count(xor(q.qw1, c.w1))
                     + bit_count(xor(q.qw2, c.w2)) AS BIGINT) AS hamming,
                q.qv
         FROM q JOIN codes c ON c.vec_id != q.q_id),
 short AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY hamming, n_id) AS srn
    FROM ham) t WHERE srn <= {_BQ_SHORTLIST}),
 rer AS (SELECT q_id, n_id, hamming,
                {_COS.format(a='qv', b='v')} AS cos_sim
         FROM short)
SELECT q_id, n_id, hamming, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_sim DESC, n_id) AS rnk
      FROM rer) t
WHERE rnk <= {_BQ_K}
"""


@register("bq_hamming_topk", oracle=_bq_oracle())
def bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized retrieval (1-bit/dim sign codes + Hamming
    shortlist + exact re-rank): pack every vector's sign pattern into
    two 64-bit words, shortlist the top-30 nearest by Hamming distance
    (two XOR+popcount ops per comparison — the cheapest similarity
    computable), then re-rank the shortlist by exact cosine and emit
    the top-5. This is the 64x-compression member of the
    quantization family — beside SQ8 (8-bit/dim) and PQ/IVFADC
    (codebook subquantizers) — and the binary-code serving pattern
    (Faiss IndexBinaryFlat / SPTAG-style sign hashing): at 100 TB the
    code table is vectors/8 bytes, small enough to pin in memory, and
    the Hamming scan is pure register arithmetic.

    Scale shape: encoding is one map-side projection (integer bit
    packing, no shuffle); the Hamming stage joins the broadcast query
    codes against the code table and keeps 30 rows per query via
    WindowGroupLimit BEFORE any expensive float math; the exact cosine
    touches only shortlist rows. The flat scan is the correctness
    baseline exactly like embedding_topk_cosine — the IVF-bucketed
    variant composes by swapping the code-table scan for probed cells.

    Determinism: codes are exact integers off `v[i] >= 0` comparisons
    (no float arithmetic), Hamming is exact, shortlist breaks ties on
    (hamming, id); only the final rerank cosine rounds to 6 dp with the
    (sim DESC, id) total order. XOR spells `xor()` in DuckDB and `^` in
    Spark SQL (DuckDB's `^` is POWER) — same exact-integer
    semantics."""
    from pyspark.sql.window import Window

    from migrate_cassandra_to_mysql_spark.functions.vectors import (
        cosine,
        to_double_array,
    )

    codes = (
        T(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            to_double_array(F.col("embedding")).alias("v"),
        )
        .select(
            "vec_id",
            "v",
            F.expr(_bq_pack_spark("v", 0)).alias("w1"),
            F.expr(_bq_pack_spark("v", 32)).alias("w2"),
        )
        .localCheckpoint(eager=True)
    )
    q = codes.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"),
    )
    ham = q.join(codes, F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        "v",
        "qv",
        F.expr(
            "CAST(bit_count(qw1 ^ w1) + bit_count(qw2 ^ w2) AS BIGINT)"
        ).alias("hamming"),
    )
    ws = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("n_id"))
    short = ham.withColumn("srn", F.row_number().over(ws)).where(
        F.col("srn") <= _BQ_SHORTLIST
    )
    rer = short.select(
        "q_id",
        "n_id",
        "hamming",
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("n_id")
    )
    return (
        rer.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= _BQ_K)
        .select(
            "q_id",
            "n_id",
            "hamming",
            "cos_sim",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# BQ-IVF composition (r13): the flat BQ row above scans every code; the
# persisted variant prunes the code scan to the probed cells first —
# the missing serving rung between SQ8 (8-bit, flat) and IVFADC
# (codebook subquantizers, probed). Same shortlist/k as the flat row so
# the two are directly comparable.
_BQIVF_CELLS = 4
_BQIVF_PROBE = 2


def _bq_ivf_oracle() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
 cb AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < {_BQIVF_CELLS}),
 scored AS (SELECT e.vec_id, e.v, cb.c_id,
                   {_COS.format(a='e.v', b='cb.cv')} AS c_sim
            FROM e CROSS JOIN cb),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY c_sim DESC, c_id) AS rn
            FROM scored),
 codes AS (SELECT vec_id, v, c_id AS cell,
                  {_bq_pack_duck('v', 0)} AS w1,
                  {_bq_pack_duck('v', 32)} AS w2
           FROM ranked WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv,
              {_bq_pack_duck('v', 0)} AS qw1,
              {_bq_pack_duck('v', 32)} AS qw2,
              c_id AS q_cell
       FROM ranked WHERE vec_id % 100 = 0 AND rn <= {_BQIVF_PROBE}),
 ham AS (SELECT q.q_id, c.vec_id AS n_id, CAST(c.cell AS BIGINT) AS cell,
                CAST(bit_count(xor(q.qw1, c.w1))
                     + bit_count(xor(q.qw2, c.w2)) AS BIGINT) AS hamming,
                q.qv, c.v
         FROM q JOIN codes c ON c.cell = q.q_cell AND c.vec_id != q.q_id),
 short AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY hamming, n_id) AS srn
    FROM ham) t WHERE srn <= {_BQ_SHORTLIST}),
 rer AS (SELECT q_id, n_id, cell, hamming,
                {_COS.format(a='qv', b='v')} AS cos_sim
         FROM short)
SELECT q_id, n_id, cell, hamming, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_sim DESC, n_id) AS rnk
      FROM rer) t
WHERE rnk <= {_BQ_K}
"""


@register("ivf_bq_hamming_topk", oracle=_bq_ivf_oracle())
def ivf_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed binary-quantized retrieval — the persisted serving
    form of bq_hamming_topk: the sign codes live on disk
    hive-partitioned by IVF cell (operators/ivf_index.build_bq_index,
    codes only — 24 bytes/vector), each query probes its 2 nearest
    cells (literal IN filter -> parquet PartitionFilters; unprobed
    cells' files never open), Hamming-shortlists the top-30 within the
    probed cells by XOR+popcount, and exact-cosine re-ranks only the
    shortlist against full vectors fetched from the base table. This is
    the missing rung between SQ8 (flat 8-bit scan) and IVFADC (probed
    codebook ADC): Faiss IndexBinaryIVF's layout, where the 100 TB
    code table is vectors/8 bytes AND the per-query scan touches only
    n_probe/k_cells of it.

    Scale shape: build is one map-side projection + partitioned write
    (memoized train-once); serving broadcasts the query codes against
    the PRUNED code scan, windows twice (WindowGroupLimit shortlist,
    top-k), and the base-vector fetch broadcasts the queries x 30
    shortlist so the vector table never shuffles. No float math
    outside the shortlist. Honest local pricing: at sf0.1's 2,000
    vectors the settled serve reads ~0.96s vs the flat row's ~0.59s —
    the whole code table is ONE parquet footer there, so the probe
    filter, the partitioned store's per-cell file opens, and the
    rerank fetch are pure overhead against a scan that was already one
    IO unit. The crossover is the point where the code table exceeds a
    scan unit (vectors/8 bytes per row: ~10^8 vectors); the plan pins
    what matters at that size — PartitionFilters prove unprobed cells'
    files never open, so the serve cost scales with n_probe/k_cells of
    the corpus while the flat row scales with all of it.

    Determinism: cell assignment/probe = cosine 6-dp + c_id tie (the
    shared _nearest_cells order, replayed by the oracle's `ranked`
    CTE); codes are exact integers; shortlist total order (hamming,
    n_id); rerank (cos_sim 6-dp DESC, n_id)."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.plans._work import memo, workdir

    emb = T(spark, sf_dir, "embeddings")

    def _build() -> str:
        d = workdir("mc2m_bqivf_")
        ivf_index.build_bq_index(
            emb, d, ivf_index.first_k_codebook(emb, _BQIVF_CELLS)
        )
        return d

    index_dir = memo(("bq_ivf_index", sf_dir), _build)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ivf_index.bq_search(
        spark,
        index_dir,
        queries,
        emb,
        k=_BQ_K,
        n_probe=_BQIVF_PROBE,
        shortlist=_BQ_SHORTLIST,
    )


@register(
    "ivf_ip_topk",
    oracle="""
WITH e AS (SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x * (1.0 + CAST(vec_id % 7 AS DOUBLE) / 4.0)) AS v
           FROM embeddings),
 c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
 scored AS (SELECT e.vec_id, e.v, c.c_id,
                   round(list_dot_product(e.v, c.cv), 6) AS ips
            FROM e CROSS JOIN c),
 rc AS (SELECT vec_id, v, c_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ips DESC, c_id) AS rn
        FROM scored),
 asn AS (SELECT vec_id, v, CAST(c_id AS BIGINT) AS cell
         FROM rc WHERE rn = 1),
 q AS (SELECT vec_id AS q_id, v AS qv, CAST(c_id AS BIGINT) AS p_cell
       FROM rc WHERE vec_id % 100 = 0 AND rn <= 2),
 cand AS (SELECT q.q_id, a.vec_id AS n_id, a.cell,
                 round(list_dot_product(q.qv, a.v), 6) AS ip
          FROM q JOIN asn a ON a.cell = q.p_cell AND a.vec_id != q.q_id),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY ip DESC, n_id) AS rnk
            FROM cand)
SELECT q_id, n_id, cell, ip, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def ivf_ip_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF maximum-inner-product (MIPS) top-3, n_probe=2 — the missing
    METRIC rung of the serving ladder: every other rung (flat, IVF,
    SQ8, BQ, IVF-BQ, IVFADC, rerank) ranks by cosine; this one
    assigns, probes, and ranks by the raw INNER PRODUCT over a corpus
    whose vector NORMS carry signal (a deterministic per-id popularity
    weight — the recommender MF convention; on the unit-norm test
    embeddings plain IP would degenerate to cosine, so the weight is
    what makes the row exercise true MIPS semantics; the
    IP-vs-cosine ranking divergence is test-pinned). MIPS is not a
    metric (no triangle inequality; a vector need not be its own
    nearest neighbor) — the cell geometry differs structurally:
    high-norm vectors dominate assignment, exactly the Faiss
    METRIC_INNER_PRODUCT IndexIVFFlat behavior this row composes.

    Scale shape (the embedding_ivf_topk discipline): scaling +
    assignment + probe ranking are one map-side literal-codebook
    expression chain (codebook memoized per sf_dir — train-once,
    query-many); the exploded (query, probed-cell) rows broadcast
    against the cell-equijoin, so the corpus never shuffles and
    unprobed cells never join; the only ordered state is the
    per-query top-k window. Reference: quyetmv/migrate-cassandra-to-
    mysql has no vector surface; engine-added for the
    training-data/serving pipeline."""
    from migrate_cassandra_to_mysql_spark.plans._work import memo

    emb = T(spark, sf_dir, "embeddings")
    cents = memo(
        ("ivf_ip_centroid_rows", sf_dir),
        lambda: similarity.ip_centroid_rows(emb, 4),
    )
    return similarity.ivf_ip_topk(
        emb, n_centroids=4, query_mod=100, k=3, n_probe=2,
        centroids=cents,
    )
