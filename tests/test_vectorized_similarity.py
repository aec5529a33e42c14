from __future__ import annotations

from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.similarity import brute_force_topk
from migrate_cassandra_to_mysql_spark.operators.similarity_vectorized import (
    brute_force_topk_vectorized,
)
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_vectorized_topk_matches_jvm_topk(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 8
    jvm = brute_force_topk(emb, pred, k=5)
    vec = brute_force_topk_vectorized(emb, pred, k=5)
    j = {(r["q_id"], r["n_id"]): (r["cos_sim"], r["rnk"]) for r in jvm.collect()}
    v = {(r["q_id"], r["n_id"]): (r["cos_sim"], r["rnk"]) for r in vec.collect()}
    assert set(j) == set(v)
    for key in j:
        assert abs(j[key][0] - v[key][0]) < 1e-9  # same rounded similarity
        assert j[key][1] == v[key][1]  # same rank
