from __future__ import annotations

from migrate_cassandra_to_mysql_spark.operators.kmeans import kmeans
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    assigned, history = kmeans(emb, k=4, n_iter=4)
    assert len(history) == 4
    for a, b in zip(history, history[1:]):
        assert b <= a + 1e-9  # Lloyd's algorithm: inertia never increases
    rows = assigned.collect()
    assert len(rows) == emb.count()
    assert {r["cluster"] for r in rows} <= set(range(4))


def test_kmeans_deterministic(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").limit(100)
    a1, h1 = kmeans(emb, k=3, n_iter=2)
    a2, h2 = kmeans(emb, k=3, n_iter=2)
    assert h1 == h2
    m1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert m1 == m2
