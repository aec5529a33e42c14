"""Round-14 operator tests.

Covers the r13 ADVICE hardening (Theil-Sen / CUSUM DECIMAL(38,0)
overflow folds, the JM OOV-bigram guard) and the round's new
operators, each with a pure-Python third-engine reference where the
semantics allow.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Theil-Sen DECIMAL(38,0) slope fold (r13 ADVICE #1)
# ---------------------------------------------------------------------------


def test_ts_slope_exact_where_old_bigint_product_wrapped(spark):
    """dy * 1e6 past 2^63 silently wrapped in the old BIGINT form; the
    DECIMAL(38,0) split identity must return the EXACT floor quotient
    whenever the quotient itself fits int64 — in BOTH engines."""
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _TS_SLOPE_SQL,
    )

    cases = [
        # (dy, d): dy*1e6 overflows int64, floor(dy*1e6/d) fits.
        (55_000_000_000_000, 6),
        (-55_000_000_000_000, 6),  # negative: floor, not truncate
        (9_223_372_036_854, 1),  # just under the output bound at d=1
        (13_835_058_055_282, 2),
        (7, 3),  # tiny sanity row (old path agreed here)
        (-7, 3),
    ]
    expected = [dy * 10**6 // d for dy, d in cases]

    sdf = spark.createDataFrame(cases, "dy long, d long").select(
        F.expr(_TS_SLOPE_SQL.format(fd="div")).alias("s")
    )
    got_spark = [r["s"] for r in sdf.collect()]
    assert got_spark == expected

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT "
            + _TS_SLOPE_SQL.format(fd="//")
            + f" FROM (SELECT CAST({dy} AS BIGINT) dy,"
            f" CAST({d} AS BIGINT) d)"
        ).fetchone()[0]
        for dy, d in cases
    ]
    assert got_duck == expected


def test_ts_slope_overflow_is_loud_not_wrapped(spark):
    """Past the BIGINT output bound the row must fail LOUDLY in BOTH
    engines: Spark 4's ANSI-default DECIMAL(38,0)->BIGINT cast raises
    CAST_OVERFLOW, DuckDB raises a conversion error — never a silently
    wrapped value (the old raw-BIGINT product wrapped without a
    sound)."""
    from pyspark.errors.exceptions.captured import ArithmeticException

    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _TS_SLOPE_SQL,
    )

    dy, d = 10_000_000_000_000, 1  # slope = 1e19 > 2^63
    with pytest.raises(ArithmeticException, match="CAST_OVERFLOW"):
        spark.createDataFrame([(dy, d)], "dy long, d long").select(
            F.expr(_TS_SLOPE_SQL.format(fd="div")).alias("s")
        ).collect()

    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.execute(
            "SELECT "
            + _TS_SLOPE_SQL.format(fd="//")
            + f" FROM (SELECT CAST({dy} AS BIGINT) dy,"
            f" CAST({d} AS BIGINT) d)"
        ).fetchone()


def test_cusum_scaled_exact_past_2_53(spark):
    """n*p - t*s folds through DECIMAL(38,0): products past 2^53 (where
    a double fallback would round) and past 2^63 (where raw BIGINT
    wrapped) stay exact as long as the DIFFERENCE fits int64."""
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _CUSUM_SCALED_SQL,
    )

    # n*p and t*s each ~1.2e19 (> 2^63); difference is small and exact.
    n, p, t, s = 1_200_000_000, 10_000_000_017, 1_200_000_000, 10_000_000_000
    expected = n * p - t * s  # = 1.2e9 * 17 = 20_400_000_000
    row = (
        spark.createDataFrame(
            [(n, p, t, s)], "n long, p long, t long, s long"
        )
        .select(F.expr(_CUSUM_SCALED_SQL).alias("c"))
        .collect()[0]
    )
    assert row["c"] == expected

    con = duckdb.connect()
    got = con.execute(
        "SELECT "
        + _CUSUM_SCALED_SQL
        + f" FROM (SELECT CAST({n} AS BIGINT) n, CAST({p} AS BIGINT) p,"
        f" CAST({t} AS BIGINT) t, CAST({s} AS BIGINT) s)"
    ).fetchone()[0]
    assert got == expected


# ---------------------------------------------------------------------------
# JM bigram OOV guard (r13 ADVICE #4)
# ---------------------------------------------------------------------------


def test_jm_score_skips_zero_support_bigram(spark):
    """A query bigram with cf = 0 (no corpus support) contributes
    exactly 0.0 instead of ln(0)/0-by-0 — identical in both engines,
    so the invariant is structural, not an assumption about the
    query list."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _JM_BIGRAMS,
        _jm_score_sql,
    )

    import math

    n = len(_JM_BIGRAMS)
    # Bigram 0 supported (tf=2 of pc=4 doc-side, cf=10/cpf=40 corpus);
    # all other bigrams have zero corpus support (cf=0, cpf=0).
    vals = {"tf0": 2, "pc0": 4, "cf0": 10, "cpf0": 40}
    for i in range(1, n):
        vals.update({f"tf{i}": 0, f"pc{i}": 0, f"cf{i}": 0, f"cpf{i}": 0})
    cols = ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in vals.items())

    expected = round(math.log(0.7 * (2 / 4) + 0.3 * (10 / 40)), 8)

    got_spark = (
        spark.sql(f"SELECT {_jm_score_sql()} AS jm FROM (SELECT {cols})")
        .collect()[0]["jm"]
    )
    assert got_spark == pytest.approx(expected, abs=0)

    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT {_jm_score_sql()} AS jm FROM (SELECT {cols})"
    ).fetchone()[0]
    assert got_duck == got_spark


# ---------------------------------------------------------------------------
# Link-prediction wedge-center degree ceiling (r13 VERDICT ask #2)
# ---------------------------------------------------------------------------


def test_link_prediction_hub_center_excluded_by_deg_ceil(spark):
    """A wedge center past deg_ceil is excluded from BOTH indices —
    pairs whose ONLY common neighbor is the hub vanish instead of
    exploding the self-join; pairs with an in-cap center keep exactly
    the in-cap contribution (pure-Python reference)."""
    import math

    from migrate_cassandra_to_mysql_spark.operators.components import (
        link_prediction_scores,
    )

    # Hub 100 ~ leaves 1..10 (deg 10); center 200 ~ leaves 1..3 (deg 3).
    edges = [(i, 100) for i in range(1, 11)] + [(i, 200) for i in (1, 2, 3)]
    und = spark.createDataFrame(edges, "a long, b long")

    capped = {
        (r["part_a"], r["part_b"]): r
        for r in link_prediction_scores(und, deg_ceil=8).collect()
    }

    # Leaf pairs seen ONLY through the hub are gone entirely.
    assert (4, 5) not in capped and (1, 4) not in capped
    # Leaf pairs that share center 200 keep ONLY the center's term.
    aa_c = round(round(1.0 / math.log(3.0), 12), 8)
    ra_c = round(round(1.0 / 3.0, 12), 8)
    for pair in ((1, 2), (1, 3), (2, 3)):
        row = capped[pair]
        assert row["n_common"] == 1
        assert row["adamic_adar"] == pytest.approx(aa_c, abs=0)
        assert row["resource_alloc"] == pytest.approx(ra_c, abs=0)
    # (hub, center) rides the three deg-2 leaves — all in-cap.
    row = capped[(100, 200)]
    assert row["n_common"] == 3
    assert row["adamic_adar"] == pytest.approx(
        round(3 * round(1.0 / math.log(2.0), 12), 8), abs=0
    )
    assert row["resource_alloc"] == pytest.approx(
        round(3 * round(1.0 / 2.0, 12), 8), abs=0
    )

    # Control: with the ceiling lifted, the hub-only pairs reappear —
    # the cap (not some other pruning) is what excluded them.
    uncapped = {
        (r["part_a"], r["part_b"]): r
        for r in link_prediction_scores(und, deg_ceil=10**6).collect()
    }
    assert (4, 5) in uncapped
    assert uncapped[(1, 2)]["n_common"] == 2  # hub + center


# ---------------------------------------------------------------------------
# dedup_recall_eval near-threshold band (r13 VERDICT ask #6)
# ---------------------------------------------------------------------------


def test_dedup_recall_band_discriminates(spark, sf_dir):
    """The band corpus makes the eval a real discriminator: recall and
    precision are strictly < 1.0 (100% on exact copies alone was the
    r13 saturation), hits are non-trivial, and the injected prefix
    pairs actually straddle the 0.5 truth threshold."""
    from migrate_cassandra_to_mysql_spark.operators import dedup
    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _inject_band_dups_spark,
    )
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    row = catalog.queries()["dedup_recall_eval"](spark, sf_dir).collect()[0]
    assert 0 < row["n_hits"] <= row["n_truth"]
    assert 0 < row["recall_ppm"] < 1_000_000
    assert 0 < row["precision_ppm"] < 1_000_000

    # Fixture sanity: the (orig, +2000000) prefix pairs form a band
    # around J = 0.5 — members on BOTH sides of the truth threshold.
    base = _inject_band_dups_spark(T(spark, sf_dir, "documents"))
    band = (
        dedup.jaccard_pairs(base, k=3, threshold=0.05)
        .where(F.col("doc_b") == F.col("doc_a") + 2_000_000)
        .select("jaccard")
        .collect()
    )
    js = [r["jaccard"] for r in band]
    assert len(js) > 0
    assert any(j >= 0.5 for j in js), "no band pair reaches truth"
    assert any(j < 0.5 for j in js), "no band pair below threshold"
    assert all(0.30 <= j <= 0.75 for j in js), sorted(js)[:5]


# ---------------------------------------------------------------------------
# Edge-build bucketed pre-aggregation (r13 VERDICT ask #1 rework)
# ---------------------------------------------------------------------------


def test_directed_pairs_basket_form_equals_self_join_form(spark, sf_dir):
    """The r14 basket-explode edge build emits the IDENTICAL directed
    edge set the old (ok,p)-distinct self-join form emitted — the
    pagerank/ppr values are functions of that set only."""
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import (
        _directed_copurchase_pairs,
    )
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    full = _directed_copurchase_pairs(spark, sf_dir)
    got = full.select("src", "dst")
    li = T(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    o = items.select("ok", F.col("p").alias("dst"))
    want = (
        items.join(o, "ok")
        .where(F.col("p") != F.col("dst"))
        .select(F.col("p").alias("src"), "dst")
        .dropDuplicates()
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # r15: the parquet precomputes each src's out-degree (the value the
    # pagerank/ppr operators consume via outdeg_col) — it must equal
    # the per-src row count of the deduped edge set, on every row.
    bad = (
        full.groupBy("src", "n_out")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n_out") != F.col("n"))
    )
    assert bad.isEmpty()


# ---------------------------------------------------------------------------
# r14 new operators: trigram Markov + grouped isotonic (PAVA)
# ---------------------------------------------------------------------------


def test_trigram_transitions_pure_python_reference(spark, sf_dir):
    """Third-engine check: recount (prev2, prev1, next) triples and
    both conditional ppm estimates with plain Python dicts over the
    identically-ordered event stream."""
    from collections import Counter, defaultdict

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(
        "SELECT user_id, event_type FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = defaultdict(list)
    for uid, et in rows:
        seqs[uid].append(et)
    tri = Counter()
    for s in seqs.values():
        for i in range(2, len(s)):
            tri[(s[i - 2], s[i - 1], s[i])] += 1
    n_from = Counter()
    n1 = Counter()
    n1_from = Counter()
    for (p2, p1, nx), c in tri.items():
        n_from[(p2, p1)] += c
        n1[(p1, nx)] += c
        n1_from[p1] += c

    got = catalog.queries()["event_trigram_transitions"](
        spark, sf_dir
    ).collect()
    assert len(got) == len(tri)
    for r in got:
        key = (r["prev2"], r["prev1"], r["next_type"])
        assert r["n_trans"] == tri[key]
        assert r["n_from"] == n_from[(r["prev2"], r["prev1"])]
        assert r["p2_ppm"] == r["n_trans"] * 1_000_000 // r["n_from"]
        p1 = (
            n1[(r["prev1"], r["next_type"])]
            * 1_000_000
            // n1_from[r["prev1"]]
        )
        assert r["p1_ppm"] == p1
        assert r["memory_ppm"] == r["p2_ppm"] - p1
    # The A/B is non-degenerate: second order moves SOME predictions.
    assert any(r["memory_ppm"] != 0 for r in got)


def _pava_fractions(ys):
    """Classic pool-adjacent-violators over exact Fractions."""
    from fractions import Fraction

    blocks: list[list[int]] = []
    for y in ys:
        blocks.append([y, 1])
        while len(blocks) > 1 and Fraction(
            blocks[-2][0], blocks[-2][1]
        ) > Fraction(blocks[-1][0], blocks[-1][1]):
            s, c = blocks.pop()
            blocks[-1][0] += s
            blocks[-1][1] += c
    out = []
    for s, c in blocks:
        out.extend([Fraction(s, c)] * c)
    return out


def test_isotonic_equals_pure_python_pava(spark, sf_dir):
    """The minimax form the row computes equals sequential PAVA's
    pooled-block means EXACTLY (Fractions, no float), per nation; the
    micro output is the floor-quantized fit."""
    from collections import defaultdict
    from fractions import Fraction

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(
        """
SELECT n.n_name, year(o.o_orderdate) - 1992 AS x,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for name, _x, y in rows:
        series[name].append(int(y))
    want = {name: _pava_fractions(ys) for name, ys in series.items()}

    got = catalog.queries()["isotonic_trend_by_nation"](
        spark, sf_dir
    ).collect()
    seen = defaultdict(int)
    for r in got:
        i = seen[r["n_name"]]
        seen[r["n_name"]] += 1
        f = want[r["n_name"]][i]
        assert Fraction(r["iso_scaled"], 2520) == f, (r["n_name"], i)
        assert r["iso_micro"] == (f * 1_000_000).__floor__()
    assert dict(seen) == {k: len(v) for k, v in want.items()}
    # The fit is monotone non-decreasing within every nation.
    by_nation = defaultdict(list)
    for r in got:
        by_nation[r["n_name"]].append(r["iso_scaled"])
    for vals in by_nation.values():
        assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# IVF inner-product (MIPS) serving rung
# ---------------------------------------------------------------------------


def test_ivf_ip_all_probes_equals_brute_force_mips(spark, sf_dir):
    """Probing every cell makes IVF-IP exactly brute-force MIPS — the
    flat-equality contract every probed rung in the ladder pins."""
    from migrate_cassandra_to_mysql_spark.operators import similarity
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    emb = T(spark, sf_dir, "embeddings")
    got = {
        (r["q_id"], r["rnk"]): (r["n_id"], r["ip"])
        for r in similarity.ivf_ip_topk(
            emb, n_centroids=4, query_mod=100, k=3, n_probe=4
        ).collect()
    }
    scaled = similarity.ip_scaled(emb)
    q = scaled.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    from pyspark.sql import Window

    flat = (
        F.broadcast(q)
        .crossJoin(scaled)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0D,"
                    " (acc, x) -> acc + x)"
                ),
                6,
            ).alias("ip"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("ip"), F.asc("n_id")
                )
            )
            .cast("long"),
        )
        .where(F.col("rnk") <= 3)
    )
    want = {
        (r["q_id"], r["rnk"]): (r["n_id"], r["ip"]) for r in flat.collect()
    }
    assert got == want and len(got) > 0


def test_mips_ranking_diverges_from_cosine(spark, sf_dir):
    """On the norm-weighted corpus, inner-product top-k and cosine
    top-k genuinely disagree for some query — the metric (not just the
    index) is what the rung adds."""
    from migrate_cassandra_to_mysql_spark.operators import similarity
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
    from pyspark.sql import Window

    emb = T(spark, sf_dir, "embeddings")
    scaled = similarity.ip_scaled(emb)
    q = scaled.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dot = (
        "aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x)"
    )
    cos = (
        f"({dot} / (sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x))"
        " * sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x))))"
    )
    both = (
        F.broadcast(q)
        .crossJoin(scaled)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(F.expr(dot), 6).alias("ip"),
            F.round(F.expr(cos), 6).alias("cs"),
        )
    )
    top_ip = {
        (r["q_id"], r["n_id"])
        for r in both.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("ip"), F.asc("n_id")
                )
            ),
        )
        .where(F.col("rnk") <= 3)
        .collect()
    }
    top_cos = {
        (r["q_id"], r["n_id"])
        for r in both.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cs"), F.asc("n_id")
                )
            ),
        )
        .where(F.col("rnk") <= 3)
        .collect()
    }
    assert top_ip != top_cos


# ---------------------------------------------------------------------------
# session_path_topk + chi_square_independence pure-Python references
# ---------------------------------------------------------------------------


def test_session_paths_pure_python_reference(spark, sf_dir):
    """Third-engine check: sessionize and mine paths with plain Python
    over the identically-ordered event stream."""
    from collections import Counter, defaultdict

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(
        "SELECT user_id, epoch(CAST(ts AS TIMESTAMP)), event_type"
        " FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for uid, ep, et in rows:
        by_user[uid].append((ep, et))
    paths = Counter()
    for evs in by_user.values():
        sessions, cur, last = [], [], None
        for ep, et in evs:
            if last is None or ep - last > 1800:
                if cur:
                    sessions.append(cur)
                cur = []
            cur.append(et)
            last = ep
        if cur:
            sessions.append(cur)
        for s in sessions:
            paths[">".join(s[:5])] += 1
    want = sorted(
        paths.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]

    got = [
        (r["path"], r["n_sessions"])
        for r in catalog.queries()["session_path_topk"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


def test_chi_square_pure_python_reference(spark, sf_dir):
    """Third-engine check: recompute chi2 / Cramer's V from raw cell
    counts with plain Python floats, replaying the engines' exact
    rounding sequence."""
    import math
    from collections import Counter

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    cells = Counter(
        dict(
            ((s, p), c)
            for s, p, c in con.execute(
                "SELECT o_orderstatus, o_orderpriority, count(*)"
                " FROM orders GROUP BY 1, 2"
            ).fetchall()
        )
    )
    n = sum(cells.values())
    r_tot = Counter()
    c_tot = Counter()
    for (s, p), c in cells.items():
        r_tot[s] += c
        c_tot[p] += c
    # exact integer num/den, engine rounding sequence replayed
    from decimal import Decimal

    chi2_sum = Decimal(0)
    for (s, p), o in cells.items():
        num = (n * o - r_tot[s] * c_tot[p]) ** 2
        den = n * r_tot[s] * c_tot[p]
        chi2_sum += Decimal(str(round(float(num) / float(den), 12)))
    r_cnt, c_cnt = len(r_tot), len(c_tot)
    chi2 = round(float(chi2_sum), 8)
    v = round(
        math.sqrt(float(chi2_sum) / (n * min(r_cnt - 1, c_cnt - 1))), 8
    )

    row = catalog.queries()["chi_square_independence"](
        spark, sf_dir
    ).collect()[0]
    assert row["n"] == n
    assert (row["r_cnt"], row["c_cnt"]) == (r_cnt, c_cnt)
    assert row["dof"] == (r_cnt - 1) * (c_cnt - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=0)
    assert row["cramers_v"] == pytest.approx(v, abs=0)


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------------


def test_mann_whitney_pure_python_reference(spark, sf_dir):
    """Third-engine check: brute-force pair counting (the U
    definition, +1 per a>b and +1/2 per tie via the doubled form)
    against the histogram/prefix-sum plan, plus the U2_a + U2_b =
    2*n1*n2 identity and the AUC/z replays."""
    import math

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    a = [
        int(v)
        for (v,) in con.execute(
            "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT) FROM orders WHERE o_orderpriority = '1-URGENT'"
        ).fetchall()
    ]
    b = [
        int(v)
        for (v,) in con.execute(
            "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT) FROM orders WHERE o_orderpriority = '5-LOW'"
        ).fetchall()
    ]
    b_sorted = sorted(b)
    import bisect

    u2 = 0
    for x in a:
        lo = bisect.bisect_left(b_sorted, x)
        hi = bisect.bisect_right(b_sorted, x)
        u2 += 2 * lo + (hi - lo)  # 2 per win, 1 per tie

    row = catalog.queries()["mann_whitney_u"](spark, sf_dir).collect()[0]
    n1, n2 = len(a), len(b)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u2_a"] == u2
    assert row["u2_b"] == 2 * n1 * n2 - u2
    assert row["auc_ppm"] == u2 * 500_000 // (n1 * n2)
    z = round(
        (u2 / 2.0 - n1 * n2 / 2.0)
        / math.sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0),
        8,
    )
    assert row["z_score"] == pytest.approx(z, abs=1e-8)


# ---------------------------------------------------------------------------
# Kaplan-Meier repeat-purchase survival
# ---------------------------------------------------------------------------


def test_kaplan_meier_pure_python_reference(spark, sf_dir):
    """Third-engine check: replay the product-limit estimator from raw
    per-customer order dates (the lifelines KaplanMeierFitter
    contract) — right-censor each customer's last order at the corpus
    max date, build the duration table, then recompute n_risk / d / c
    per event time and the engines' exact rounding sequence for S(t).
    Also pins the structural KM facts: S is non-increasing, every
    at-risk count equals the number of durations >= t, and total
    censored across the curve equals the customer count."""
    import math
    from collections import Counter
    from decimal import Decimal

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    rows = con.execute(
        "SELECT o_custkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()
    by_cust: dict = {}
    for ck, od in rows:
        by_cust.setdefault(ck, []).append(od)
    maxd = max(od for _, od in rows)
    events = Counter()
    censored = Counter()
    for dates in by_cust.values():
        dates.sort()
        for a, b in zip(dates, dates[1:]):
            events[(b - a).days] += 1
        censored[(maxd - dates[-1]).days] += 1

    all_durs = sorted(set(events) | set(censored))
    n_at_risk = sum(events.values()) + sum(censored.values())
    expected = []
    cum = Decimal(0)
    dead = False
    for t in all_durs:
        d, c = events.get(t, 0), censored.get(t, 0)
        if d > 0:
            if d < n_at_risk:
                cum += Decimal(
                    str(round(math.log((n_at_risk - d) / n_at_risk), 12))
                )
            else:
                dead = True
            s = 0.0 if dead else round(math.exp(float(cum)), 8)
            expected.append((t, n_at_risk, d, c, s))
        n_at_risk -= d + c

    got = [
        (
            r["dur_days"],
            r["n_risk"],
            r["n_event"],
            r["n_censored"],
            r["survival_8dp"],
        )
        for r in catalog.queries()["kaplan_meier_repurchase"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expected

    # Structural pins.
    survs = [s for *_, s in got]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[0] < 1.0  # events exist at the earliest event time
    assert sum(r[3] for r in got) <= len(by_cust)  # censored <= customers


def test_logrank_pure_python_reference(spark, sf_dir):
    """Third-engine check: replay the Mantel-Cox hypergeometric sums
    from raw per-customer order dates (the lifelines logrank_test
    contract) with plain Python ints/floats, including the engines'
    exact rounding sequence, and pin the structural facts: the
    combined event totals match the KM-style duration table and the
    chi2 equals z^2 up to the emitted rounding."""
    from collections import Counter
    from decimal import Decimal

    import duckdb as _duckdb

    from migrate_cassandra_to_mysql_spark.plans import catalog

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    rows = con.execute(
        "SELECT o_custkey, o_orderpriority, CAST(o_orderdate AS DATE)"
        " FROM orders"
    ).fetchall()
    by_cust: dict = {}
    for ck, pri, od in rows:
        by_cust.setdefault(ck, []).append((od, pri))
    maxd = max(od for _, _, od in rows)
    obs = []  # (dur, stratum 'a'/'b', event)
    for seq in by_cust.values():
        seq.sort(key=lambda t: t[0])
        for (a_od, a_pri), (b_od, _) in zip(seq, seq[1:]):
            obs.append(((b_od - a_od).days, a_pri, 1))
        last_od, last_pri = seq[-1]
        obs.append(((maxd - last_od).days, last_pri, 0))
    obs = [
        (dur, "a" if p == "1-URGENT" else "b", ev)
        for dur, p, ev in obs
        if p in ("1-URGENT", "5-LOW")
    ]
    d_a, c_a, d_b, c_b = Counter(), Counter(), Counter(), Counter()
    for dur, s, ev in obs:
        [[c_a, d_a], [c_b, d_b]][s == "b"][ev][dur] += 1
    n_a = sum(1 for _, s, _ in obs if s == "a")
    n_b = len(obs) - n_a
    oe_sum, v_sum = Decimal(0), Decimal(0)
    events_a = events_b = 0
    for t in sorted({dur for dur, _, _ in obs}):
        da, db = d_a.get(t, 0), d_b.get(t, 0)
        d, n = da + db, n_a + n_b
        if d > 0:
            oe_sum += Decimal(str(round(da - (n_a * d) / n, 12)))
            if n > 1:
                v_sum += Decimal(
                    str(
                        round(
                            (n_a * n_b * d * (n - d))
                            / (n * n * (n - 1)),
                            12,
                        )
                    )
                )
            events_a += da
            events_b += db
        n_a -= da + c_a.get(t, 0)
        n_b -= db + c_b.get(t, 0)

    row = catalog.queries()["logrank_repurchase_test"](
        spark, sf_dir
    ).collect()[0]
    assert (row["events_a"], row["events_b"]) == (events_a, events_b)
    assert row["o_minus_e_a"] == pytest.approx(float(oe_sum), abs=1e-8)
    assert row["lr_variance"] == pytest.approx(float(v_sum), abs=1e-8)
    chi2 = round(float(oe_sum) * float(oe_sum) / float(v_sum), 8)
    import math

    z = round(float(oe_sum) / math.sqrt(float(v_sum)), 8)
    assert row["logrank_chi2"] == pytest.approx(chi2, abs=1e-8)
    assert row["z_score"] == pytest.approx(z, abs=1e-8)
    assert row["logrank_chi2"] == pytest.approx(
        row["z_score"] ** 2, abs=1e-6
    )


def test_km_exhaustion_guard_is_load_bearing(spark):
    """The survival rows claim the d = n exhaustion case is 'handled
    structurally on both engines'. Pin it: (a) on a risk set that
    exhausts at the last event time, the guarded term + flag yield an
    exact 0.0 survival in BOTH engines; (b) the NEGATIVE control — the
    unguarded ln((n-d)/n) on that row — genuinely diverges (Spark
    ln(0) = NULL, DuckDB -inf), proving the CASE guard is load-bearing
    rather than decorative."""
    from migrate_cassandra_to_mysql_spark.plans.statsplans import (
        _KM_SURV_SQL,
        _KM_TERM_SQL,
    )

    # (dur, n_event, n_risk): 5 at risk, 2 events, then 3 events that
    # exhaust the remaining risk set.
    rows = [(1, 2, 5), (2, 3, 3)]
    sdf = spark.createDataFrame(
        rows, "dur_days long, n_event long, n_risk long"
    ).select("dur_days", F.expr(_KM_TERM_SQL).alias("term"))
    got_terms = {
        r["dur_days"]: r["term"] for r in sdf.collect()
    }
    con = duckdb.connect()
    duck_terms = dict(
        con.execute(
            "SELECT dur_days, "
            + _KM_TERM_SQL
            + " FROM (VALUES (1, 2, 5), (2, 3, 3))"
            " t(dur_days, n_event, n_risk)"
        ).fetchall()
    )
    # Guarded: both engines agree exactly — the exhaustion row's term
    # is excluded (0), the survivor row's term is the rounded ln(3/5).
    import math

    assert float(got_terms[2]) == float(duck_terms[2]) == 0.0
    assert float(got_terms[1]) == float(duck_terms[1])
    assert float(got_terms[1]) == round(math.log(3 / 5), 12)

    # Survival emission: the flag pins exact 0.0 in both engines.
    surv_rows = [(float(got_terms[1]), 1)]
    s_spark = (
        spark.createDataFrame(
            surv_rows, "cum_log double, zf int"
        )
        .select(F.expr(_KM_SURV_SQL).alias("s"))
        .collect()[0]["s"]
    )
    s_duck = con.execute(
        "SELECT "
        + _KM_SURV_SQL
        + f" FROM (VALUES ({float(got_terms[1])}, 1)) t(cum_log, zf)"
    ).fetchone()[0]
    assert s_spark == s_duck == 0.0

    # Negative control: WITHOUT the guard the engines diverge on the
    # exhaustion row — Spark silently yields NULL while DuckDB RAISES
    # (Out of Range: cannot take logarithm of zero), i.e. the oracle
    # side would crash the differential outright.
    raw = (
        "ln(CAST(n_risk - n_event AS DOUBLE)"
        " / CAST(n_risk AS DOUBLE))"
    )
    spark_raw = (
        spark.createDataFrame([(3, 3)], "n_event long, n_risk long")
        .select(F.expr(raw).alias("x"))
        .collect()[0]["x"]
    )
    assert spark_raw is None
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(
            "SELECT " + raw + " FROM (VALUES (3, 3)) t(n_event, n_risk)"
        )
