"""Semantics tests for the r11 operators (beyond their DuckDB oracles):
canonical keep picks the best copy, sparse cosine pairs only through
discriminative terms, RM3 expansion genuinely recalls new documents,
and the ANN eval metrics satisfy their arithmetic invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators import components
from migrate_cassandra_to_mysql_spark.plans import catalog


def test_canonical_keep_picks_best_by_quality(spark):
    """Unit: within each cluster the canonical is the highest-quality
    member (ties to lowest id); singletons keep themselves; exactly one
    keep per component."""
    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (9, 9, True)],
        "doc_id long, component long, is_survivor boolean",
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)], "doc_id long, quality long"
    )
    out = {
        r["doc_id"]: r
        for r in components.canonical_keep(clusters, quality).collect()
    }
    # doc 2 and 3 tie on quality 30 — lowest id (2) wins; not min-id 1
    assert out[1]["canonical_id"] == 2 and not out[1]["keep"]
    assert out[2]["keep"] and out[3]["canonical_id"] == 2
    assert out[9]["keep"] and out[9]["canonical_id"] == 9
    by_comp = {}
    for r in out.values():
        by_comp.setdefault(r["component"], []).append(r["keep"])
    assert all(sum(ks) == 1 for ks in by_comp.values())


def test_dedup_canonical_keep_originals_beat_clones(spark, sf_dir):
    """Catalog row: a clone can never be canonical — its original ties
    it on length with a lower id, so whatever wins the cluster (the
    original, or an organically-similar LONGER member) always beats the
    clone; the canonical is always a longest member of its cluster."""
    rows = catalog.queries()["dedup_canonical_keep"](
        spark, sf_dir
    ).collect()
    clones = [r for r in rows if r["doc_id"] >= 1_000_000]
    assert clones, "injected clones missing from the output"
    lengths = {r["doc_id"]: r["n_chars_m"] for r in rows}
    max_len_by_comp: dict = {}
    for r in rows:
        max_len_by_comp[r["component"]] = max(
            max_len_by_comp.get(r["component"], 0), r["n_chars_m"]
        )
    for r in clones:
        assert not r["keep"]
        assert lengths[r["canonical_id"]] >= r["n_chars_m"]
    for r in rows:
        if r["keep"]:
            assert r["n_chars_m"] == max_len_by_comp[r["component"]]
    keeps_per_comp = {}
    for r in rows:
        keeps_per_comp.setdefault(r["component"], 0)
        keeps_per_comp[r["component"]] += int(r["keep"])
    assert all(v == 1 for v in keeps_per_comp.values())


def test_sparse_cosine_pairs_shape(spark, sf_dir):
    """Pairs are ordered (doc_a < doc_b), cosines in (0, 1] above the
    threshold, and every pair genuinely shares kept (rare) terms. On
    this synthetic corpus 30 of 31 vocabulary terms exceed the df cap,
    so surviving pairs are exactly the docs sharing rare vocabulary —
    the discriminative-subspace semantics the docstring documents."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _SC_THRESHOLD,
    )

    rows = catalog.queries()["sparse_cosine_pairs"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= 1
        assert _SC_THRESHOLD <= r["cosine"] <= 1.0


def test_rm3_expansion_recalls_new_documents(spark, sf_dir):
    """The expansion pass must DO something: the RM3 top-20 differs
    from the plain BM25 top-20 and brings in documents the literal
    query missed (the recall-expansion the operator exists for)."""
    qs = catalog.queries()
    bm = [r["doc_id"] for r in qs["bm25_topk_search"](spark, sf_dir).collect()]
    rm = [
        r["doc_id"]
        for r in qs["rm3_query_expansion_topk"](spark, sf_dir).collect()
    ]
    assert len(rm) == 20
    assert rm != bm
    assert set(rm) - set(bm), "expansion recalled no new documents"


def test_mmr_diversifies_against_plain_topk(spark, sf_dir):
    """MMR semantics: pick 1 is the plain top-1; exactly k picks per
    query, all drawn from the candidate top-N; and the MMR list is no
    MORE redundant than the plain top-k — its average pairwise cosine
    never exceeds the plain list's (that's the objective it optimizes),
    with at least one query strictly diversified."""
    import itertools

    from migrate_cassandra_to_mysql_spark.operators import similarity
    from migrate_cassandra_to_mysql_spark.plans.vectorplans import (
        _MMR_K,
        _MMR_N,
    )
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    emb = T(spark, sf_dir, "embeddings")
    mmr = catalog.queries()["mmr_diversified_topk"](spark, sf_dir).collect()
    plain = similarity.brute_force_topk(
        emb, F.col("vec_id") % 100 == 0, k=_MMR_N
    ).collect()
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        d = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        return d / (na * nb)

    def avg_pairwise(ids):
        ps = list(itertools.combinations(ids, 2))
        return sum(cos(a, b) for a, b in ps) / len(ps)

    by_q: dict = {}
    for r in mmr:
        by_q.setdefault(r["q_id"], []).append(r)
    plain_by_q: dict = {}
    for r in plain:
        plain_by_q.setdefault(r["q_id"], []).append(r)

    strictly_diversified = 0
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["step"])
        assert [r["step"] for r in rows] == list(range(1, _MMR_K + 1))
        cand_ids = {r["n_id"] for r in plain_by_q[q]}
        assert {r["n_id"] for r in rows} <= cand_ids
        top1 = min(
            plain_by_q[q], key=lambda r: (-r["cos_sim"], r["n_id"])
        )["n_id"]
        assert rows[0]["n_id"] == top1
        plain_k = [
            r["n_id"]
            for r in sorted(
                plain_by_q[q], key=lambda r: (-r["cos_sim"], r["n_id"])
            )[:_MMR_K]
        ]
        mmr_ids = [r["n_id"] for r in rows]
        red_mmr = avg_pairwise(mmr_ids)
        red_plain = avg_pairwise(plain_k)
        assert red_mmr <= red_plain + 1e-9
        if mmr_ids != plain_k:
            strictly_diversified += 1
    assert strictly_diversified >= 1


def test_ann_recall_eval_invariants(spark, sf_dir):
    """Metric arithmetic: recall = hits/K in ppm; rr positive iff the
    true top-1 made the system list; dcg bounded by the ideal; ndcg in
    [0, 1e6]; one row per query."""
    from migrate_cassandra_to_mysql_spark.operators import similarity
    from migrate_cassandra_to_mysql_spark.plans.vectorplans import _EVAL_K
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    rows = catalog.queries()["ann_recall_eval"](spark, sf_dir).collect()
    emb = T(spark, sf_dir, "embeddings")
    n_queries = emb.where(F.col("vec_id") % 100 == 0).count()
    assert len(rows) == n_queries
    import math

    idcg = sum(
        math.floor(1_000_000_000.0 / math.log2(r + 1.0))
        for r in range(1, _EVAL_K + 1)
    )
    for r in rows:
        assert r["recall_ppm"] == (r["n_hits"] * 1_000_000) // _EVAL_K
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert 0 <= r["dcg"] <= idcg
        if r["n_hits"] == 0:
            assert r["rr_ppm"] == 0 and r["dcg"] == 0

    # cross-check one query's n_hits against an independent intersection
    truth = similarity.brute_force_topk(
        emb, F.col("vec_id") % 100 == 0, k=_EVAL_K
    ).collect()
    sysr = similarity.ivfpq_topk(
        emb,
        n_cells=4,
        m=4,
        n_centers=4,
        query_mod=100,
        k=_EVAL_K,
        n_probe=2,
        cell_centroids=similarity.first_k_cell_centroids(emb, 4),
        centers=similarity.first_k_pq_centers(emb, 4, 4),
    ).collect()
    t0 = {r["n_id"] for r in truth if r["q_id"] == 0}
    s0 = {r["n_id"] for r in sysr if r["q_id"] == 0}
    want = len(t0 & s0)
    got = next(r["n_hits"] for r in rows if r["q_id"] == 0)
    assert got == want


def test_lm_dirichlet_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for lm_dirichlet_topk: recompute the Dirichlet
    query-likelihood ranking in pure Python (pandas + math) from the raw
    parquet and require the identical top-20 (ids AND 8-dp scores)."""
    import math

    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _BM25_TERMS,
        _QL_MU,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "text"]
    ]
    toks = docs["text"].map(lambda t: t.strip().split())
    dl = toks.map(len)
    tf = {t: toks.map(lambda ts, t=t: ts.count(t)) for t in _BM25_TERMS}
    tot = float(dl.sum())
    cf = {t: float(tf[t].sum()) for t in _BM25_TERMS}
    mu = float(_QL_MU)
    scored = []
    for i in range(len(docs)):
        hits = sum(int(tf[t].iat[i]) for t in _BM25_TERMS)
        if hits == 0:
            continue
        s = sum(
            math.log(
                (tf[t].iat[i] + mu * (cf[t] / tot)) / (dl.iat[i] + mu)
            )
            for t in _BM25_TERMS
        )
        scored.append((round(s, 8), int(docs["doc_id"].iat[i]), hits))
    scored.sort(key=lambda r: (-r[0], r[1]))
    want = scored[:20]

    got = (
        catalog.queries()["lm_dirichlet_topk"](spark, sf_dir)
        .orderBy(F.desc("ql"), F.asc("doc_id"))
        .collect()
    )
    assert [(r["ql"], r["doc_id"], r["n_hits"]) for r in got] == [
        (pytest.approx(s, abs=2e-8), d, h) for s, d, h in want
    ]
    # log-probabilities: every score is strictly negative
    assert all(r["ql"] < 0 for r in got)


def test_lm_dirichlet_smoothing_prefers_shorter_on_equal_tf(spark, sf_dir):
    """Semantics: with tf and the corpus model fixed, the score is
    strictly decreasing in document length — the Dirichlet denominator
    (dl + MU) is the length normalization."""
    import math

    from migrate_cassandra_to_mysql_spark.plans.textplans import _QL_MU

    mu = float(_QL_MU)
    p_c = 0.01  # any collection probability

    def score(tf, dl):
        return math.log((tf + mu * p_c) / (dl + mu))

    assert score(3, 20) > score(3, 40) > score(3, 80)
    # and increasing in tf at fixed length
    assert score(4, 40) > score(3, 40) > score(0, 40)


def test_sq8_reconstruction_error_bounded(sf_dir):
    """Quantizer invariant, independent of both engines: numpy-replayed
    SQ8 reconstruction error is bounded by rng / (2 * 255) per
    component (half a quantization step), and codes are integral in
    [0, 255]."""
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64)
    mn = v.min(axis=0)
    rng = v.max(axis=0) - mn
    safe = np.where(rng == 0.0, 1.0, rng)
    q = np.where(rng == 0.0, 0.0, np.floor(255.0 * (v - mn) / safe + 0.5))
    assert q.min() >= 0 and q.max() <= 255
    assert np.array_equal(q, np.floor(q))
    recon = mn + q * rng / 255.0
    err = np.abs(recon - v)
    assert (err <= rng / 510.0 + 1e-12).all()


def test_sq8_topk_recall_against_exact(spark, sf_dir):
    """Serving quality: 8-bit scalar quantization over 64 dims barely
    moves cosine, so the SQ8 top-5 must overlap the exact-cosine top-5
    almost everywhere (>= 4 of 5 on average here; exactness is already
    pinned by the DuckDB oracle — this pins that the APPROXIMATION is
    good, which the oracle cannot see)."""
    from migrate_cassandra_to_mysql_spark.operators import similarity
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    exact = similarity.brute_force_topk(
        T(spark, sf_dir, "embeddings"), F.col("vec_id") % 100 == 0, k=5
    ).collect()
    sq8 = catalog.queries()["sq8_quantized_topk"](spark, sf_dir).collect()
    q_ids = {r["q_id"] for r in exact}
    assert q_ids == {r["q_id"] for r in sq8}
    overlaps = []
    for qid in q_ids:
        t = {r["n_id"] for r in exact if r["q_id"] == qid}
        s = {r["n_id"] for r in sq8 if r["q_id"] == qid}
        overlaps.append(len(t & s) / 5.0)
    assert sum(overlaps) / len(overlaps) >= 0.8


def test_triangles_match_pure_python_reference(spark, sf_dir):
    """Third-engine check for part_copurchase_triangles: rebuild the
    support-pruned graph in pandas, enumerate triangles by brute force
    over the (tiny) pruned edge set, and require the identical top-20
    per-node participation counts."""
    from itertools import combinations

    import pandas as pd

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import Counter, defaultdict

    pair_support: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for a, b in combinations(parts, 2):
            pair_support[(a, b)] += 1
    edges = {e for e, s in pair_support.items() if s >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri_count: Counter = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                tri_count[a] += 1
                tri_count[b] += 1
                tri_count[c] += 1
    want = sorted(
        ((n, c) for n, c in tri_count.items()), key=lambda t: (-t[1], t[0])
    )[:20]

    got = catalog.queries()["part_copurchase_triangles"](
        spark, sf_dir
    ).collect()
    assert [(r["part_id"], r["n_triangles"]) for r in got] == want
    assert want, "test corpus has no triangles — assertion vacuous"


def test_ewma_matches_pure_python_and_first_row_identity(spark, sf_dir):
    """Third-engine check for events_ewma_smoothing: recompute the
    renormalized depth-16 EWMA in pure Python per user and require
    identical 8-dp values; a user's FIRST event must equal its own
    value (weight renormalization, not zero-padding)."""
    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans.relational import (
        _EWMA_DECAY,
        _EWMA_DEPTH,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_id", "value"]
    ].sort_values(["user_id", "event_id"])
    want = {}
    for uid, grp in ev.groupby("user_id"):
        vals = list(grp["value"])
        ids = list(grp["event_id"])
        for i in range(len(vals)):
            lo = max(0, i - _EWMA_DEPTH + 1)
            window = vals[lo : i + 1][::-1]  # most recent first
            num = sum(
                (v if v == v and v is not None else 0.0)
                * _EWMA_DECAY**j
                for j, v in enumerate(window)
            )
            den = sum(_EWMA_DECAY**j for j in range(len(window)))
            want[(uid, ids[i])] = round(num / den, 8)

    got = catalog.queries()["events_ewma_smoothing"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["user_id"], r["event_id"])] == pytest.approx(
            r["ewma"], abs=2e-8
        ), (r["user_id"], r["event_id"])
    # first event per user: ewma == value exactly (den == 1)
    firsts = ev.groupby("user_id").head(1)
    by_key = {(r["user_id"], r["event_id"]): r["ewma"] for r in got}
    for _, row in firsts.iterrows():
        v = row["value"]
        if v == v:  # skip NaN
            assert by_key[(row["user_id"], row["event_id"])] == round(v, 8)


def test_association_rules_match_pure_python_reference(spark, sf_dir):
    """Third-engine check for copurchase_association_rules: recompute
    support/confidence/lift in pure Python from the raw parquet and
    require the identical top-20 (keys AND 8-dp metrics); lift's
    direction-symmetry and the confidence bound must hold."""
    from collections import Counter
    from itertools import combinations

    import pandas as pd

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    item_cnt = Counter(li["l_partkey"])
    n_orders = li["l_orderkey"].nunique()
    support: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp["l_partkey"])), 2):
            support[(a, b)] += 1
    rows = []
    for (a, b), s in support.items():
        if s < 2:
            continue
        rows.append(
            (
                round(s * n_orders / (item_cnt[a] * item_cnt[b]), 8),
                a,
                b,
                s,
                round(s / item_cnt[a], 8),
                round(s / item_cnt[b], 8),
            )
        )
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = [(a, b, s, cab, cba, l) for l, a, b, s, cab, cba in rows[:20]]

    got = catalog.queries()["copurchase_association_rules"](
        spark, sf_dir
    ).collect()
    assert [
        (
            r["part_a"],
            r["part_b"],
            r["support"],
            r["conf_ab"],
            r["conf_ba"],
            r["lift"],
        )
        for r in got
    ] == want
    for r in got:
        assert 0 < r["conf_ab"] <= 1 and 0 < r["conf_ba"] <= 1
        assert r["lift"] > 0
