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
