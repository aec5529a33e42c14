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
