"""CDC snapshot_diff: keyed insert/delete/update classification."""

from migrate_cassandra_to_mysql_spark.operators.reconcile import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v STRING, p DOUBLE")


def test_classifies_all_change_types(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _df(spark, [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)])
    got = {
        (r.k, r.change_type)
        for r in snapshot_diff(old, new, ["k"], ["v", "p"]).collect()
    }
    # key 2 unchanged -> absent
    assert got == {(1, "delete"), (3, "update"), (4, "insert")}


def test_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k BIGINT, v STRING")
    new = spark.createDataFrame([(1, None), (2, None)], "k BIGINT, v STRING")
    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    # NULL == NULL must count as unchanged; x -> NULL is an update
    assert {(r.k, r.change_type) for r in rows} == {(2, "update")}


def test_old_new_values_carried(spark):
    old = _df(spark, [(3, "c", 3.0)])
    new = _df(spark, [(3, "c", 9.0)])
    r = snapshot_diff(old, new, ["k"], ["v", "p"]).collect()[0]
    assert (r.old_p, r.new_p) == (3.0, 9.0)
    assert (r.old_v, r.new_v) == ("c", "c")


def test_empty_diff_when_identical(spark):
    old = _df(spark, [(1, "a", 1.0)])
    assert snapshot_diff(old, old, ["k"], ["v", "p"]).count() == 0


def test_scd2_merge_version_semantics(spark):
    from migrate_cassandra_to_mysql_spark.operators.merge import scd2_merge

    ex = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (5, None, "E")],
        ["id", "total", "status"],
    )
    inc = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (4, 40.0, "D"), (5, None, "E")],
        ["id", "total", "status"],
    )
    rows = scd2_merge(
        ex, inc, ["id"], ["total", "status"],
        t1="2026-01-01 00:00:00", t2="2026-02-01 00:00:00",
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # unchanged -> one open row from t1
    (u,) = by_id[1]
    assert u["is_current"] and u["valid_to"] is None
    # changed -> closed old + open new
    vs = sorted(by_id[2], key=lambda r: r["valid_from"])
    assert len(vs) == 2
    assert not vs[0]["is_current"] and vs[0]["total"] == 20.0
    assert vs[0]["valid_to"] == vs[1]["valid_from"]
    assert vs[1]["is_current"] and vs[1]["total"] == 25.0
    # deleted -> single closed row
    (d,) = by_id[3]
    assert not d["is_current"] and d["valid_to"] is not None
    # inserted -> single open row from t2
    (i,) = by_id[4]
    assert i["is_current"] and i["valid_from"].month == 2
    # NULL tracked values compare null-safely: no spurious version
    (n,) = by_id[5]
    assert n["is_current"] and n["total"] is None


def test_scd2_merge_randomized_invariants(spark):
    """Seeded-random snapshot pairs: structural SCD2 invariants plus
    cross-operator consistency — the current-version set must equal the
    incoming snapshot exactly, and current+deleted rows together must
    match merge_snapshots(latest_wins) values."""
    import random

    from migrate_cassandra_to_mysql_spark.operators.merge import (
        merge_snapshots,
        scd2_merge,
    )

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        keys = list(range(60))
        ex_rows = [
            (k, rng.choice([None, 10.0, 20.0, 30.0]), rng.choice("ABC"))
            for k in keys
            if rng.random() < 0.8
        ]
        ex_keys = {r[0] for r in ex_rows}
        inc_rows = []
        for k in keys:
            if rng.random() < 0.8:
                if k in ex_keys and rng.random() < 0.5:
                    inc_rows.append(next(r for r in ex_rows if r[0] == k))
                else:
                    inc_rows.append(
                        (k, rng.choice([None, 15.0, 25.0]), rng.choice("CDE"))
                    )
        ex = spark.createDataFrame(ex_rows, ["id", "total", "status"])
        inc = spark.createDataFrame(inc_rows, ["id", "total", "status"])
        out = scd2_merge(
            ex, inc, ["id"], ["total", "status"],
            t1="2026-01-01 00:00:00", t2="2026-02-01 00:00:00",
        ).collect()

        cur = {(r["id"], r["total"], r["status"]) for r in out if r["is_current"]}
        assert cur == set(inc_rows), f"seed {seed}: current != incoming"
        per_key = {}
        for r in out:
            per_key.setdefault(r["id"], []).append(r)
        inc_keys = {r[0] for r in inc_rows}
        inc_by_key = {r[0]: r for r in inc_rows}
        ex_by_key = {r[0]: r for r in ex_rows}
        for k, rs in per_key.items():
            assert sum(r["is_current"] for r in rs) <= 1
            changed = (
                k in ex_keys
                and k in inc_keys
                and ex_by_key[k] != inc_by_key[k]
            )
            assert len(rs) == (2 if changed else 1), f"seed {seed} key {k}"
            for r in rs:
                assert r["is_current"] == (r["valid_to"] is None)
        # latest state implied by the history == merge_snapshots latest_wins
        latest = cur | {
            (r["id"], r["total"], r["status"])
            for r in out
            if r["id"] not in inc_keys
        }
        merged = {
            (r["id"], r["total"], r["status"])
            for r in merge_snapshots(
                ex, inc, ["id"], ["total", "status"], policy="latest_wins"
            ).collect()
        }
        assert latest == merged, f"seed {seed}: history != latest_wins merge"


def _py_scd2_fold(generations):
    """Pure-Python reference fold: generations is [(t, {key: values})].
    Returns the expected history as a set of
    (key, values, valid_from, valid_to, is_current) tuples."""
    closed = []
    open_rows = {}  # key -> (values, t_from)
    for t, snap in generations:
        for k, vals in snap.items():
            if k not in open_rows:
                open_rows[k] = (vals, t)
            elif open_rows[k][0] != vals:
                old_vals, t_from = open_rows.pop(k)
                closed.append((k, old_vals, t_from, t))
                open_rows[k] = (vals, t)
        for k in list(open_rows):
            if k not in snap:
                old_vals, t_from = open_rows.pop(k)
                closed.append((k, old_vals, t_from, t))
    return {(k, v, f, to, False) for k, v, f, to in closed} | {
        (k, v, f, None, True) for k, (v, f) in open_rows.items()
    }


def test_scd2_increment_equals_pairwise_merge(spark):
    """Base-case identity: init + one increment must reproduce scd2_merge
    row-for-row — the incremental fold is a strict generalization."""
    from migrate_cassandra_to_mysql_spark.operators.merge import (
        scd2_apply_increment,
        scd2_init,
        scd2_merge,
    )

    ex = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (5, None, "E")],
        ["id", "total", "status"],
    )
    inc = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (4, 40.0, "D"), (5, None, "E")],
        ["id", "total", "status"],
    )
    t1, t2 = "2026-01-01 00:00:00", "2026-02-01 00:00:00"
    pair = scd2_merge(ex, inc, ["id"], ["total", "status"], t1=t1, t2=t2)
    fold = scd2_apply_increment(
        scd2_init(ex, ["id"], ["total", "status"], t1),
        inc, ["id"], ["total", "status"], t2,
    )
    assert sorted(map(tuple, pair.collect())) == sorted(
        map(tuple, fold.collect())
    )


def test_scd2_multi_generation_fold_randomized(spark):
    """Seeded-random FOUR-generation folds, checked against a pure-Python
    reference fold — covers every transition chain the incremental
    operator must get right, including delete-then-re-insert (closed row
    survives untouched, fresh open version starts) and repeated updates
    of one key (N closed versions, contiguous valid_to/valid_from)."""
    from migrate_cassandra_to_mysql_spark.operators.merge import (
        scd2_apply_increment,
        scd2_init,
    )
    import random

    stamps = [f"2026-0{i}-01 00:00:00" for i in (1, 2, 3, 4)]
    for seed in (11, 42):
        rng = random.Random(seed)
        keys = list(range(40))
        gens = []
        for t in stamps:
            snap = {}
            for k in keys:
                if rng.random() < 0.7:
                    snap[k] = (rng.choice([10.0, 20.0, None]), rng.choice("AB"))
            gens.append((t, snap))

        dfs = [
            spark.createDataFrame(
                [(k, v[0], v[1]) for k, v in snap.items()],
                "id bigint, total double, status string",
            )
            for _, snap in gens
        ]
        hist = scd2_init(dfs[0], ["id"], ["total", "status"], gens[0][0])
        for (t, _), df in zip(gens[1:], dfs[1:]):
            hist = scd2_apply_increment(hist, df, ["id"], ["total", "status"], t)

        got = {
            (
                r["id"],
                (r["total"], r["status"]),
                str(r["valid_from"]),
                str(r["valid_to"]) if r["valid_to"] is not None else None,
                r["is_current"],
            )
            for r in hist.collect()
        }
        want = {
            (k, v, f"{f}", to if to is None else f"{to}", cur)
            for k, v, f, to, cur in _py_scd2_fold(gens)
        }
        assert got == want, f"seed {seed}"
        # structural: at most one open version per key, time-ordered
        per_key = {}
        for r in hist.collect():
            per_key.setdefault(r["id"], []).append(r)
        for k, rs in per_key.items():
            assert sum(r["is_current"] for r in rs) <= 1, k
            rs = sorted(rs, key=lambda r: r["valid_from"])
            for a, b in zip(rs, rs[1:]):
                assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]


def test_scd2_increment_empty_frames(spark):
    """Degenerate generations: an EMPTY snapshot closes every current row
    (mass delete); an increment onto an all-closed history only inserts.
    Both arise in real re-sync schedules (source outage -> empty pull,
    then a recovery snapshot) and must not error or drop history."""
    from migrate_cassandra_to_mysql_spark.operators.merge import (
        scd2_apply_increment,
        scd2_init,
    )

    schema = "id bigint, total double, status string"
    s1 = spark.createDataFrame([(1, 10.0, "A"), (2, 20.0, "B")], schema)
    empty = spark.createDataFrame([], schema)
    keys, tracked = ["id"], ["total", "status"]

    h1 = scd2_init(s1, keys, tracked, "2026-01-01 00:00:00")
    h2 = scd2_apply_increment(h1, empty, keys, tracked, "2026-02-01 00:00:00")
    rows = h2.collect()
    assert len(rows) == 2
    assert all(not r["is_current"] and r["valid_to"] is not None for r in rows)

    # recovery snapshot re-inserts one key: closed rows untouched, one
    # fresh open version
    s3 = spark.createDataFrame([(2, 25.0, "B")], schema)
    h3 = scd2_apply_increment(h2, s3, keys, tracked, "2026-03-01 00:00:00")
    per_key = {}
    for r in h3.collect():
        per_key.setdefault(r["id"], []).append(r)
    assert len(per_key[1]) == 1 and not per_key[1][0]["is_current"]
    vs = sorted(per_key[2], key=lambda r: r["valid_from"])
    assert len(vs) == 2
    assert not vs[0]["is_current"] and vs[0]["total"] == 20.0
    assert vs[1]["is_current"] and vs[1]["total"] == 25.0
    assert vs[1]["valid_from"].month == 3
