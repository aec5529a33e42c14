"""Semantics tests for the r12 operators (beyond their DuckDB oracles):
peeling/frontier/label-propagation loop semantics on known toy graphs,
phrase matching on hand-counted documents, OLS coefficients against an
independent closed-form recomputation, and numpy third-engine
reproductions of the matryoshka and binary-quantization rankings.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators import components
from migrate_cassandra_to_mysql_spark.plans import catalog


def _und(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_kcore_peels_pendants_keeps_cycle(spark):
    """Unit: triangle {1,2,3} with pendant chain 3-4-5. k=2 peels the
    chain (5 then 4), keeps the triangle at degree 2; k=3 empties it."""
    g = _und(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)])
    out = {
        r["node"]: r["degree"]
        for r in components.kcore(g, k=2, rounds=5).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}
    assert components.kcore(g, k=3, rounds=5).count() == 0


def test_kcore_k3_keeps_k4_clique(spark):
    g = _und(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)],
    )
    out = {
        r["node"]: r["degree"]
        for r in components.kcore(g, k=3, rounds=5).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_bfs_hops_chain_distances(spark):
    """Unit: symmetric chain 1-2-3-4-5-6, seed {1}: dists 0..4 within
    max_hops=4; node 6 (5 hops) is absent."""
    chain = [(i, i + 1) for i in range(1, 6)]
    sym = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in components.bfs_hops(sym, seeds, max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_hops_multi_source_takes_min(spark):
    chain = [(i, i + 1) for i in range(1, 6)]
    sym = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in components.bfs_hops(sym, seeds, max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0, 6: 1}


def test_label_propagation_splits_bridged_cliques(spark):
    """Unit: two triangles bridged by one edge resolve to two
    communities labeled by each clique's min id — connected components
    would merge them into one."""
    und = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    sym = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {
        r["node"]: r["community"]
        for r in components.label_propagation(sym, rounds=4).collect()
    }
    # each clique settles on ONE label, and the two labels differ (sync
    # LPA may ferry a bridge-adjacent label into a clique — e.g. node 4
    # adopts 3 in round 1 and re-seeds its clique — so the pinned
    # property is the SPLIT, not which id wins)
    c1 = {out[1], out[2], out[3]}
    c2 = {out[4], out[5], out[6]}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    comp = {
        r["id"]: r["component"]
        for r in components.connected_components(
            spark.createDataFrame(und, "src long, dst long")
        ).collect()
    }
    assert len(set(comp.values())) == 1  # one blob, two communities


def test_kcore_catalog_row_is_converged_core(spark, sf_dir):
    """Catalog row: at the test scales peeling reaches its fixed point
    within the pinned rounds, so every member's in-core degree is >= k
    (the defining k-core property, which a non-converged bound would
    violate)."""
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import _KCORE_K

    rows = catalog.queries()["kcore_decomposition"](spark, sf_dir).collect()
    assert rows
    assert all(r["core_degree"] >= _KCORE_K for r in rows)


def test_bfs_catalog_row_seed_and_bound_invariants(spark, sf_dir):
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import (
        _BFS_HOPS,
        _BFS_SEED_MOD,
    )

    rows = catalog.queries()["bfs_shortest_hops"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dist"] <= _BFS_HOPS
        assert (r["dist"] == 0) == (r["part_id"] % _BFS_SEED_MOD == 0)


def test_lpa_catalog_row_labels_stay_inside_components(spark, sf_dir):
    """A community label can only travel along edges, so two parts in
    different connected components can never share one."""
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import _und_edges

    rows = catalog.queries()["label_propagation_communities"](
        spark, sf_dir
    ).collect()
    assert rows
    lbl = {r["part_id"]: r["community"] for r in rows}
    assert set(lbl.values()) <= set(lbl)  # labels are node ids
    und = _und_edges(spark, sf_dir)
    comp = {
        r["id"]: r["component"]
        for r in components.connected_components(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        ).collect()
    }
    for node, label in lbl.items():
        assert comp[node] == comp[label]


def test_phrase_proximity_hand_counted(spark, tmp_path):
    """Hand-counted phrase/proximity arithmetic through the catalog row
    on a purpose-built corpus."""
    import os

    d = str(tmp_path / "phrasedocs")
    os.makedirs(d)
    docs = spark.createDataFrame(
        [
            (1, "table scan table scan"),  # 2 adjacent (+1 at distance 3)
            (2, "table x scan"),  # d=2 near
            (3, "table x y scan"),  # d=3 near
            (4, "scan table"),  # wrong order: nothing
            (5, "table x y z scan"),  # d=4: outside window
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in catalog.queries()["phrase_proximity_topk"](
            spark, d
        ).collect()
    }
    assert rows[1]["n_phrase"] == 2 and rows[1]["n_near"] == 1
    assert rows[1]["prox_score"] == 7
    assert rows[2]["n_phrase"] == 0 and rows[2]["n_near"] == 1
    assert rows[3]["n_phrase"] == 0 and rows[3]["n_near"] == 1
    assert 4 not in rows and 5 not in rows


def test_ols_trend_matches_independent_solve(spark, sf_dir):
    """Recompute each nation's sufficient statistics independently
    (exact Python ints off the same DECIMAL-cents quantization) and
    verify the emitted coefficients equal floor(num/den) of the same
    IEEE divisions."""
    import math

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    stats = con.execute(
        """
        WITH yr AS (
          SELECT n.n_name, CAST(year(o.o_orderdate) - 1992 AS BIGINT) AS x,
                 CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                      AS BIGINT) AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1, 2)
        SELECT n_name, count(*), sum(x), sum(y), sum(x*y), sum(x*x)
        FROM yr GROUP BY 1
        """
    ).fetchall()
    want = {}
    for name, n, sx, sy, sxy, sxx in stats:
        n, sx, sy, sxy, sxx = map(int, (n, sx, sy, sxy, sxx))
        if n < 2:
            continue
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        slope_f = float(num) / float(den)
        want[name] = (
            n,
            math.floor(slope_f),
            math.floor((float(sy) - slope_f * float(sx)) / float(n)),
        )
    got = {
        r["n_name"]: (
            r["n_years"],
            r["slope_cents_per_year"],
            r["intercept_cents"],
        )
        for r in catalog.queries()["ols_trend_by_nation"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def _load_vectors(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    order = np.argsort(ids)
    return ids[order], vecs[order]


def _topk_ids(q, ids, vecs, qid, d, k):
    a, b = q[:d], vecs[:, :d]
    cos = b @ a / (np.linalg.norm(b, axis=1) * np.linalg.norm(a))
    cos = np.round(cos, 6)
    mask = ids != qid
    cand = sorted(
        zip(-cos[mask], ids[mask])
    )  # sim desc, id asc — the catalog tie-break
    return [int(i) for _, i in cand[:k]]


def test_matryoshka_eval_matches_numpy(spark, sf_dir):
    from migrate_cassandra_to_mysql_spark.plans.vectorplans import (
        _MAT_DIMS,
        _MAT_FULL,
        _MAT_K,
    )

    ids, vecs = _load_vectors(sf_dir)
    rows = catalog.queries()["matryoshka_ann_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        qv = vecs[ids == r["q_id"]][0]
        full = _topk_ids(qv, ids, vecs, r["q_id"], _MAT_FULL, _MAT_K)
        trunc = _topk_ids(
            qv, ids, vecs, r["q_id"], int(r["trunc_dim"]), _MAT_K
        )
        assert r["n_overlap"] == len(set(full) & set(trunc))
        assert r["recall_ppm"] == r["n_overlap"] * 1_000_000 // _MAT_K
        assert r["top1_match"] == int(full[0] == trunc[0])
    assert {int(r["trunc_dim"]) for r in rows} == set(_MAT_DIMS)


def test_bq_hamming_matches_numpy(spark, sf_dir):
    """Numpy third-engine reproduction of the full binary-quantization
    serving chain: sign packing, Hamming shortlist (with the (hamming,
    id) tie-break), exact rerank — row-for-row equal."""
    from migrate_cassandra_to_mysql_spark.plans.vectorplans import (
        _BQ_K,
        _BQ_SHORTLIST,
    )

    ids, vecs = _load_vectors(sf_dir)
    bits = (vecs >= 0).astype(np.uint64)
    rows = catalog.queries()["bq_hamming_topk"](spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for qid, got in by_q.items():
        qbits = bits[ids == qid][0]
        ham = (bits != qbits).sum(axis=1)
        mask = ids != qid
        short = sorted(zip(ham[mask], ids[mask]))[:_BQ_SHORTLIST]
        short_ids = [int(i) for _, i in short]
        qv = vecs[ids == qid][0]
        sel = np.isin(ids, short_ids)
        cos = np.round(
            vecs[sel] @ qv
            / (np.linalg.norm(vecs[sel], axis=1) * np.linalg.norm(qv)),
            6,
        )
        rer = sorted(zip(-cos, ids[sel]))[:_BQ_K]
        want = [int(i) for _, i in rer]
        got_sorted = sorted(got, key=lambda r: r["rnk"])
        assert [r["n_id"] for r in got_sorted] == want
        ham_by_id = dict(zip(ids[mask], ham[mask]))
        for r in got_sorted:
            assert r["hamming"] == int(ham_by_id[r["n_id"]])


def test_kcore_early_exit_matches_full_unroll(spark):
    """Peeling stops at its fixed point: a generous round bound returns
    the identical core as the exact convergence depth (post-fixed-point
    rounds are no-op filters), so the bound is cost-free slack."""
    g = _und(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)])
    fast = {
        (r["node"], r["degree"])
        for r in components.kcore(g, k=2, rounds=3).collect()
    }
    slack = {
        (r["node"], r["degree"])
        for r in components.kcore(g, k=2, rounds=50).collect()
    }
    assert fast == slack == {(1, 2), (2, 2), (3, 2)}


def test_label_propagation_rejects_string_node_ids(spark):
    """The deterministic tie-break negates the label inside max_by —
    a string label would silently cast to NULL and break the
    smallest-label rule, so non-numeric node ids must fail loudly."""
    sym = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    with pytest.raises(TypeError, match="numeric node ids"):
        components.label_propagation(sym, rounds=1)
