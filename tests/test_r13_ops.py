"""Round-13 operators: IVF-bucketed binary quantization
(operators/ivf_index.build_bq_index + bq_search), shingle containment
near-dup, and grouped MAD outliers.

BQ-IVF invariants pinned here:
  - probing ALL cells reproduces the flat bq_hamming_topk ranking
    exactly (cell pruning changes the candidate set, never the scoring);
  - the probed-cell serve reads the codes scan through parquet
    PartitionFilters (plan-shape pin);
  - recall vs the exact-cosine truth is a meaningful share at
    n_probe=2 and non-decreasing in n_probe.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators import ivf_index
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


@pytest.fixture(scope="module")
def bq_index_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bqivf"))
    emb = T(spark, sf_dir, "embeddings")
    ivf_index.build_bq_index(emb, d, ivf_index.first_k_codebook(emb, 4))
    return d


def _queries(spark, sf_dir):
    return (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )


def test_bq_ivf_all_probe_equals_flat(spark, sf_dir, bq_index_dir):
    """n_probe = k_cells admits every candidate, so the IVF serve must
    reproduce the flat full-scan BQ ranking bit for bit (same shortlist
    order, same rerank) — cell layout is pruning, not scoring."""
    from migrate_cassandra_to_mysql_spark.plans import catalog

    flat = {
        (r["q_id"], r["n_id"], r["rnk"], r["hamming"], r["cos_sim"])
        for r in catalog.queries()["bq_hamming_topk"](
            spark, sf_dir
        ).collect()
    }
    ivf = {
        (r["q_id"], r["n_id"], r["rnk"], r["hamming"], r["cos_sim"])
        for r in ivf_index.bq_search(
            spark,
            bq_index_dir,
            _queries(spark, sf_dir),
            T(spark, sf_dir, "embeddings"),
            k=5,
            n_probe=4,
            shortlist=30,
        ).collect()
    }
    assert flat == ivf


def test_bq_ivf_partition_filter_reaches_codes_scan(
    spark, sf_dir, bq_index_dir
):
    df = ivf_index.bq_search(
        spark,
        bq_index_dir,
        _queries(spark, sf_dir),
        T(spark, sf_dir, "embeddings"),
        k=5,
        n_probe=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf_lines = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "/codes" in ln
    ]
    assert pf_lines, plan
    assert any("cell" in ln and " IN " in ln for ln in pf_lines), pf_lines


def test_bq_ivf_recall_vs_exact_and_probe_monotone(
    spark, sf_dir, bq_index_dir
):
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = T(spark, sf_dir, "embeddings")
    exact = brute_force_topk(emb, F.col("vec_id") % 100 == 0, k=5).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["q_id"], set()).add(r["n_id"])

    def recall(n_probe):
        rows = ivf_index.bq_search(
            spark, bq_index_dir, _queries(spark, sf_dir), emb,
            k=5, n_probe=n_probe,
        ).collect()
        got = {}
        for r in rows:
            got.setdefault(r["q_id"], set()).add(r["n_id"])
        hits = sum(len(got.get(q, set()) & w) for q, w in truth.items())
        return hits / sum(len(w) for w in truth.values())

    r2, r4 = recall(2), recall(4)
    # Random 64-dim data, 4 coarse cells, 1-bit codes: recall is
    # imperfect by design; pin that the pruned binary serve still finds
    # a meaningful share and that widening the probe never hurts.
    assert 0.15 <= r2 <= 1.0, r2
    assert r4 >= r2, (r2, r4)


def test_bq_ivf_codes_layout_is_codes_only(spark, sf_dir, bq_index_dir):
    """The index stores 24-byte code rows, not vectors — the 64x
    compression contract of the layout."""
    codes = spark.read.parquet(f"{bq_index_dir}/codes")
    assert set(codes.columns) == {"vec_id", "w1", "w2", "cell"}
    n_vec = T(spark, sf_dir, "embeddings").count()
    assert codes.count() == n_vec


def test_containment_catches_wrapped_doc_jaccard_misses(spark):
    """The operator's reason to exist: a short doc wrapped in long
    boilerplate has containment 1.0 but Jaccard well under the 0.5 LSH
    threshold — jaccard_pairs returns nothing for the pair while
    containment_pairs flags it."""
    from migrate_cassandra_to_mysql_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy sleeping dog today"
    boiler = " ".join(f"boilerplate{i} filler{i} chrome{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, f"{boiler} {short} {boiler} extra trailing words")],
        "doc_id long, text string",
    )
    jac = jaccard_pairs(docs, k=3, threshold=0.5).collect()
    assert jac == [], jac
    cont = containment_pairs(docs, k=3, threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # every shingle of the short doc survives inside the wrapper
    assert r["c_ab"] == 1.0
    assert r["n_shared"] == r["n_sh_a"]
    # ... while the wrapper's own set is much larger (the asymmetry)
    assert r["c_ba"] < 0.2
    assert r["n_sh_b"] > 3 * r["n_sh_a"]


def test_containment_catalog_row_flags_injected_wrappers(spark, sf_dir):
    """Every injected boilerplate-wrapped copy (doc_id + 2000000) must
    surface as a containment pair with the ORIGINAL side fully
    contained (c_ab exactly 1.0 — the wrap only adds shingles)."""
    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T2

    rows = catalog.queries()["shingle_containment_pairs"](
        spark, sf_dir
    ).collect()
    wrapped = {
        (r["doc_a"], r["doc_b"]): r
        for r in rows
        if r["doc_b"] == r["doc_a"] + 2000000
    }
    n_injected = (
        T2(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 50 == 0)
        .count()
    )
    assert len(wrapped) == n_injected
    for r in wrapped.values():
        assert r["c_ab"] == 1.0
        assert r["n_shared"] == r["n_sh_a"]
        assert r["c_ba"] <= 1.0


def test_mad_outliers_fence_invariants(spark, sf_dir):
    """Structural contract of the robust fence: one (median, MAD) pair
    per nation, dev is exactly |price - median|, and every emitted row
    clears the 2x fence."""
    from migrate_cassandra_to_mysql_spark.plans import catalog

    rows = catalog.queries()["grouped_mad_outliers"](
        spark, sf_dir
    ).collect()
    assert rows
    per_nation = {}
    for r in rows:
        assert r["dev_cents"] == abs(r["price_cents"] - r["med_cents"])
        assert r["dev_cents"] > 2 * r["mad_cents"]
        per_nation.setdefault(r["n_name"], set()).add(
            (r["med_cents"], r["mad_cents"])
        )
    for nation, fences in per_nation.items():
        assert len(fences) == 1, (nation, fences)


def test_mad_outliers_match_python_reference(spark, sf_dir):
    """The exact lower-median / MAD fence recomputed row-at-a-time in
    Python over the same join — the histogram+cumulative-window form
    must select the identical outlier set and fence values."""
    import duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    raw = con.execute(
        """
        SELECT n.n_name, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        """
    ).fetchall()
    by_nation: dict = {}
    for name, ok, cents in raw:
        by_nation.setdefault(name, []).append((ok, cents))

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    want = set()
    for name, rows_ in by_nation.items():
        med = lower_median([c for _, c in rows_])
        mad = lower_median([abs(c - med) for _, c in rows_])
        for ok, c in rows_:
            if abs(c - med) > 2 * mad:
                want.add((name, ok, c, med, mad, abs(c - med)))
    got = {
        (
            r["n_name"], r["o_orderkey"], r["price_cents"],
            r["med_cents"], r["mad_cents"], r["dev_cents"],
        )
        for r in catalog.queries()["grouped_mad_outliers"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_jm_bigram_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for jm_bigram_lm_topk: recompute the JM
    bigram query-likelihood ranking in pure Python (pandas + math) from
    the raw parquet and require the identical top-20 (ids AND 8-dp
    scores)."""
    import math

    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _JM_BIGRAMS,
        _JM_LAMBDA,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "text"]
    ]
    toks = docs["text"].map(lambda t: t.strip().split())
    lam = float(_JM_LAMBDA)

    def bg_count(ts, a, b):
        return sum(
            1
            for i in range(len(ts) - 1)
            if ts[i] == a and ts[i + 1] == b
        )

    def pc_count(ts, a):
        return sum(1 for i in range(len(ts) - 1) if ts[i] == a)

    tf = {
        (a, b): toks.map(lambda ts, a=a, b=b: bg_count(ts, a, b))
        for a, b in _JM_BIGRAMS
    }
    pc = {
        (a, b): toks.map(lambda ts, a=a: pc_count(ts, a))
        for a, b in _JM_BIGRAMS
    }
    cf = {bg: float(tf[bg].sum()) for bg in _JM_BIGRAMS}
    cpf = {bg: float(pc[bg].sum()) for bg in _JM_BIGRAMS}
    scored = []
    for i in range(len(docs)):
        hits = sum(int(tf[bg].iat[i]) for bg in _JM_BIGRAMS)
        if hits == 0:
            continue
        s = sum(
            math.log(
                lam
                * (
                    tf[bg].iat[i] / pc[bg].iat[i]
                    if pc[bg].iat[i] > 0
                    else 0.0
                )
                + (1.0 - lam) * (cf[bg] / cpf[bg])
            )
            for bg in _JM_BIGRAMS
        )
        scored.append((round(s, 8), int(docs["doc_id"].iat[i]), hits))
    scored.sort(key=lambda r: (-r[0], r[1]))
    want = scored[:20]
    assert want, "fixture must produce at least one bigram hit"

    got = (
        catalog.queries()["jm_bigram_lm_topk"](spark, sf_dir)
        .orderBy(F.desc("jm"), F.asc("doc_id"))
        .collect()
    )
    assert [(r["jm"], r["doc_id"], r["n_hits"]) for r in got] == [
        (pytest.approx(s, abs=2e-8), d, h) for s, d, h in want
    ]


def test_jm_interpolation_semantics():
    """JM smoothing invariants, independent of both engines: the
    collection term keeps every factor strictly positive even when the
    document never emits the bigram (no ln(0)); document evidence
    strictly raises the score; and the mix is monotone in lambda when
    the document model beats the collection model."""
    import math

    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _JM_LAMBDA,
    )

    lam = float(_JM_LAMBDA)
    p_c = 0.003  # any collection bigram probability > 0

    def factor(p_d):
        return lam * p_d + (1.0 - lam) * p_c

    # absent-bigram doc still scores finitely (pure collection mass)
    assert factor(0.0) > 0.0
    assert math.isfinite(math.log(factor(0.0)))
    # document evidence dominates: more in-doc bigram mass -> higher
    assert factor(0.2) > factor(0.05) > factor(0.0)
    # with p_d > p_c, raising lambda raises the factor
    assert lam * 0.2 + (1 - lam) * p_c < 0.9 * 0.2 + 0.1 * p_c


def test_link_prediction_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for copurchase_link_prediction: rebuild the
    support-pruned co-purchase graph in pure Python from the raw
    parquet, score every non-adjacent wedge pair with Adamic-Adar and
    Resource-Allocation, and require the identical top-100 (pairs AND
    8-dp scores)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import (
        _AA_TOPK,
        _TRI_SUPPORT,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    per_order = defaultdict(set)
    for ok, p in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[ok].add(int(p))
    support = defaultdict(int)
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    und = {e for e, s in support.items() if s >= _TRI_SUPPORT}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {n: len(ws) for n, ws in nbrs.items()}

    def q12(x):
        return Decimal(repr(round(x, 12)))

    scores = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    for w, ns in nbrs.items():
        if deg[w] < 2:
            continue
        aa_w, ra_w = q12(1.0 / math.log(deg[w])), q12(1.0 / deg[w])
        ns_sorted = sorted(ns)
        for i in range(len(ns_sorted)):
            for j in range(i + 1, len(ns_sorted)):
                u, v = ns_sorted[i], ns_sorted[j]
                if (u, v) in und:
                    continue
                rec = scores[(u, v)]
                rec[0] += 1
                rec[1] += aa_w
                rec[2] += ra_w
    ranked = sorted(
        (
            (round(float(aa), 8), u, v, n, round(float(ra), 8))
            for (u, v), (n, aa, ra) in scores.items()
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:_AA_TOPK]
    want = [(u, v, n, aa, ra) for aa, u, v, n, ra in ranked]
    assert want, "fixture graph must produce wedge candidates"

    got = [
        (r["part_a"], r["part_b"], r["n_common"], r["adamic_adar"],
         r["resource_alloc"])
        for r in catalog.queries()["copurchase_link_prediction"](
            spark, sf_dir
        ).collect()
    ]
    assert [
        (u, v, n, pytest.approx(aa, abs=2e-8), pytest.approx(ra, abs=2e-8))
        for u, v, n, aa, ra in want
    ] == got

    # invariants: predicted pairs are absent edges with >= 1 common
    # neighbor; RA is bounded by n_common/2 (every center has deg >= 2)
    for u, v, n, aa, ra in got:
        assert (u, v) not in und and u < v
        assert n >= 1 and aa > 0.0
        assert ra <= n / 2 + 1e-9


def test_cusum_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for cusum_changepoint: recompute the scaled
    integer CUSUM and the ppm flag in pure Python (pandas + int
    arithmetic — Python ints never overflow, so this also guards the
    BIGINT headroom claim) and require identical rows."""
    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _CUSUM_THR_PPM,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_totalprice", "o_orderdate"]
    ]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["ym"] = (
        j["o_orderdate"].dt.year * 100 + j["o_orderdate"].dt.month
    )
    # exact cents: round each price to 2dp (the DECIMAL(18,2) cast),
    # then sum as Python ints
    j["cents"] = (
        j["o_totalprice"].map(lambda v: round(v, 2) * 100).round().astype(int)
    )
    m = (
        j.groupby(["n_name", "ym"])["cents"].sum().reset_index()
        .sort_values(["n_name", "ym"])
    )
    want = []
    for name, g in m.groupby("n_name"):
        revs = [int(v) for v in g["cents"]]
        nn, ss, p = len(revs), sum(revs), 0
        for t, (ym, rev) in enumerate(zip(g["ym"], revs), start=1):
            p += rev
            cusum = nn * p - t * ss
            flag = 1 if abs(cusum) * 1_000_000 > _CUSUM_THR_PPM * nn * ss else 0
            want.append((name, int(ym), rev, cusum, flag))
    want.sort()

    got = [
        (r["n_name"], r["ym"], r["rev_cents"], r["cusum_scaled"],
         r["is_shift"])
        for r in catalog.queries()["cusum_changepoint"](
            spark, sf_dir
        ).collect()
    ]
    assert sorted(got) == want
    flags = sum(f for *_, f in got)
    assert 0 < flags < len(got), "flag mix must be non-degenerate"
    # per-group CUSUM telescopes to exactly zero at the series end
    last = {}
    for name, ym, rev, cusum, f in got:
        last[name] = cusum
    assert all(v == 0 for v in last.values())


def test_theil_sen_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for theil_sen_by_nation: recompute the
    floor-quantized pairwise slopes and both discrete medians in pure
    Python (unbounded ints — also guards the BIGINT headroom) and
    require identical rows. Python's % and // are floored like the
    row's shared pmod identity, so // IS the contract here."""
    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans import catalog

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_totalprice", "o_orderdate"]
    ]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["x"] = j["o_orderdate"].dt.year - 1992
    j["cents"] = (
        j["o_totalprice"].map(lambda v: round(v, 2) * 100).round().astype(int)
    )
    yr = j.groupby(["n_name", "x"])["cents"].sum().reset_index()

    def lower_median(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    want = []
    for name, g in yr.groupby("n_name"):
        pts = sorted((int(x), int(y)) for x, y in zip(g["x"], g["cents"]))
        if len(pts) < 2:
            continue
        slopes = [
            ((y2 - y1) * 1_000_000) // (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
        ]
        s = lower_median(slopes)
        resid = [y * 1_000_000 - s * x for x, y in pts]
        want.append((name, len(slopes), s, lower_median(resid)))
    want.sort()

    got = sorted(
        (r["n_name"], r["n_pairs"], r["ts_slope_micro"],
         r["ts_intercept_micro"])
        for r in catalog.queries()["theil_sen_by_nation"](
            spark, sf_dir
        ).collect()
    )
    assert got == want


def test_theil_sen_robust_to_outlier_ols_is_not():
    """Semantics: one corrupted year leaves the Theil-Sen slope on the
    true trend (median of pairwise slopes) while the OLS slope bends —
    the breakdown contrast that justifies both rows existing."""
    pts = [(x, 100 + 10 * x) for x in range(7)]
    pts[6] = (6, 1_000_000)  # corrupted final year

    slopes = [
        ((y2 - y1) * 1_000_000) // (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
    ]
    slopes.sort()
    ts = slopes[(len(slopes) + 1) // 2 - 1]
    assert ts == 10 * 1_000_000  # exact true slope in micro-units

    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert ols > 100_000  # dragged four orders of magnitude off 10


def test_transition_matrix_matches_pure_python_reference(spark, sf_dir):
    """Third-engine check for event_transition_matrix: replay the
    per-user (ts, event_id)-ordered lag and the exact-ppm floor
    division in pure Python and require identical rows; plus the
    conservation invariant — each prev row's ppm cells sum to within
    |cells| floor-losses of exactly 1e6."""
    from collections import defaultdict

    import pandas as pd

    from migrate_cassandra_to_mysql_spark.plans import catalog

    e = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_type", "ts", "event_id"]
    ].sort_values(["user_id", "ts", "event_id"])
    counts = defaultdict(int)
    for _, g in e.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), n in counts.items():
        totals[a] += n
    want = sorted(
        (a, b, n, totals[a], (n * 1_000_000) // totals[a])
        for (a, b), n in counts.items()
    )

    got = [
        (r["prev_type"], r["next_type"], r["n_trans"], r["n_from"],
         r["p_ppm"])
        for r in catalog.queries()["event_transition_matrix"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want

    by_prev = defaultdict(list)
    for a, _, _, _, ppm in got:
        by_prev[a].append(ppm)
    for a, ppms in by_prev.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000


def test_dedup_recall_eval_consistent_with_component_rows(spark, sf_dir):
    """dedup_recall_eval must equal the composition of its two verified
    component CONTRACTS computed independently — truth =
    jaccard_pairs, candidates = lsh_candidates, hits = their
    intersection, over the eval's own corpus (since r14 the
    NEAR-THRESHOLD band injection, r13 VERDICT ask #6 — the component
    catalog rows keep the plain injection) — plus the metric
    invariants (hits bounded by both sides, ppm floor-division
    bounds)."""
    from migrate_cassandra_to_mysql_spark.operators import dedup
    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _inject_band_dups_spark,
    )
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    qs = catalog.queries()
    base = _inject_band_dups_spark(T(spark, sf_dir, "documents"))
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            base, k=3, threshold=0.5
        ).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidates(
            base, k=3, n_hashes=8, band_size=2
        ).collect()
    }
    hits = truth & cand
    [row] = qs["dedup_recall_eval"](spark, sf_dir).collect()
    assert (row["n_truth"], row["n_candidates"], row["n_hits"]) == (
        len(truth), len(cand), len(hits),
    )
    assert row["n_hits"] <= min(row["n_truth"], row["n_candidates"])
    assert row["recall_ppm"] == (len(hits) * 1_000_000) // len(truth)
    assert row["precision_ppm"] == (len(hits) * 1_000_000) // len(cand)
    # The r14 band corpus makes both metrics strict discriminators:
    assert 0 < row["recall_ppm"] < 1_000_000
    assert 0 < row["precision_ppm"] < 1_000_000
