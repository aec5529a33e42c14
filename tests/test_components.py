"""Connected-components operator: cluster resolution for dedup."""

import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")


def test_chain_clique_singleton(spark):
    # chain 1-2-3-4, clique {10,11,12}, pair {20,21}; 99 absent from edges
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
    )
    got = {
        (r.id, r.component)
        for r in connected_components(e).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_component_is_min_reachable_not_min_neighbor(spark):
    # 5-4, 4-3, 3-1: node 5's min NEIGHBOR after one round is 4; the true
    # component is 1 — requires propagation across the chain.
    e = _edges(spark, [(5, 4), (4, 3), (3, 1)])
    got = dict(
        (r.id, r.component) for r in connected_components(e).collect()
    )
    assert got == {1: 1, 3: 1, 4: 1, 5: 1}


def test_nonconvergence_raises(spark):
    e = _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=1)


def test_dedup_clusters_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,), (7,)], "doc_id BIGINT")
    pairs = spark.createDataFrame([(1, 3)], "doc_a BIGINT, doc_b BIGINT")
    rows = {
        (r.doc_id, r.component, r.is_survivor)
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        (1, 1, True),
        (3, 1, False),
        (2, 2, True),
        (7, 7, True),
    }


def test_survivor_count_matches_components(spark):
    e = [(i, i + 1) for i in range(0, 40, 2)]  # 20 disjoint pairs
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(e, "doc_a BIGINT, doc_b BIGINT")
    out = dedup_clusters(docs, pairs)
    # 20 pair-components + 20 singletons (40..59) = 40 survivors
    assert out.where("is_survivor").count() == 40
    assert out.count() == 60


def test_long_chain_converges_with_bounded_plan(spark):
    """Adversarial diameter: a 26-node path needs 25 propagation rounds.
    Before the r7 localCheckpoint fix, the analyzed plan doubled per
    round (labels referenced twice: neighbor-min join + convergence
    probe) and plan stringification alone OOM'd the driver long before
    25 rounds — this test is the regression pin for O(1)-deep lineage
    in fact, not just intent."""
    edges = [(i, i + 1) for i in range(25)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, max_iter=30).collect()
    assert {r["id"] for r in out} == set(range(26))
    assert all(r["component"] == 0 for r in out)
