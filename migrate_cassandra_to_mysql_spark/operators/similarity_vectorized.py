"""Vectorized (Arrow/numpy) similarity scoring — the Pandas-UDF fast path.

`operators/similarity.py` computes cosine with JVM higher-order functions:
zero Python, ideal for moderate dimensionality. For wide embeddings and
large candidate sets, a numpy matmul over Arrow batches wins: one BLAS
call scores a whole batch against the broadcast query matrix instead of
per-element lambda evaluation.

This is the pattern the engine uses for any numeric kernel Spark can't
express efficiently: broadcast small side as plain Python (picklable
numpy), mapInPandas over the big side, emit only (id, score) — never the
vectors — so shuffle stays slim. The unit test pins its results to the
higher-order-function implementation (bit-agreement at 1e-9).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.localframe import local_frame

TOPK_SCHEMA = "q_id bigint, n_id bigint, cos_sim double"


def brute_force_topk_vectorized(
    embeddings: DataFrame, query_pred, k: int = 5
) -> DataFrame:
    """Exact cosine top-k via numpy matmul inside mapInPandas.

    The query matrix is collected to the driver (queries are few by
    contract) and closure-broadcast; each Arrow batch of the corpus is
    scored with one matmul, and only per-batch top candidates leave Python.
    A final window keeps global top-k per query.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qrows = e.where(query_pred).collect()
    if not qrows:
        # Empty query set: an empty (typed) result, not a numpy axis error.
        return local_frame(
            embeddings.sparkSession, [], TOPK_SCHEMA + ", rnk bigint"
        )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["v"] for r in qrows], dtype=np.float64)
    qm_unit = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["v"].to_numpy())
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            sims = (mat / norms) @ qm_unit.T  # (batch, n_queries)
            n_ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi, q_id in enumerate(q_ids):
                col = sims[:, qi]
                mask = n_ids != q_id
                # per-batch prune: keep only k best from this batch
                idx = np.argsort(-col[mask])[:k]
                sel_ids = n_ids[mask][idx]
                sel_sims = col[mask][idx]
                out_q.extend([q_id] * len(sel_ids))
                out_n.extend(sel_ids.tolist())
                out_s.extend(sel_sims.tolist())
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n, "cos_sim": out_s})

    from pyspark.sql import Window

    scored = e.mapInPandas(score, schema=TOPK_SCHEMA).withColumn(
        "cos_sim", F.round("cos_sim", 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )
