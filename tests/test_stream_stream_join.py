"""Stream-stream click attribution under multi-batch drains + restart.

The catalog's streaming_click_attribution drains its whole backlog in one
AvailableNow pass, which can't distinguish "the join is right" from "there
was never any cross-batch state" — the failure mode Spark can hit under
resume is view state written by batch N matching (or wrongly dropping /
re-emitting) clicks in batch N+1 after a checkpoint restart. These tests
split the backlog across two separately-started queries sharing one
checkpoint and assert exact pair-set equality with the batch twin.
"""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from migrate_cassandra_to_mysql_spark.plans.pipelineplans import attribution_join

_VIEW_SCHEMA = StructType(
    [
        StructField("view_id", StringType()),
        StructField("view_ts", TimestampType()),
        StructField("user_id", StringType()),
    ]
)
_CLICK_SCHEMA = StructType(
    [
        StructField("click_id", StringType()),
        StructField("click_ts", TimestampType()),
        StructField("c_user_id", StringType()),
    ]
)


def _ts(hhmm: str) -> datetime:
    h, m = hhmm.split(":")
    return datetime(2024, 3, 1, int(h), int(m))


# Batch 1 (event times 10:00-10:50) / batch 2 (11:05-11:30). The split
# point respects the 1h watermark: every batch-2 row is younger than
# (max batch-1 event time - 1h), so nothing is late-dropped and the
# streamed pair set must equal the batch join exactly.
_VIEWS_B1 = [
    ("v1", _ts("10:00"), "u1"),  # pairs with c1 inside batch 1
    ("v2", _ts("10:50"), "u2"),  # pairs with c2 ACROSS the restart
    ("v3", _ts("10:00"), "u3"),  # c3 arrives 11:10 — outside 30min, no pair
    ("v5", _ts("10:40"), "u5"),  # no click at all
]
_CLICKS_B1 = [
    ("c1", _ts("10:10"), "u1"),
    ("c0", _ts("10:05"), "u2"),  # BEFORE v2 — must not pair (click >= view)
]
_VIEWS_B2 = [
    ("v4", _ts("11:10"), "u4"),  # pairs with c4 inside batch 2
]
_CLICKS_B2 = [
    ("c2", _ts("11:05"), "u2"),  # 15min after v2: the cross-restart pair
    ("c3", _ts("11:10"), "u3"),  # 70min after v3: beyond max_delay
    ("c4", _ts("11:20"), "u4"),
]

_EXPECTED = {("v1", "c1"), ("v2", "c2"), ("v4", "c4")}


def _drain_once(
    spark, vsrc: str, csrc: str, out: str, ckpt: str, how: str = "inner"
) -> None:
    """One AvailableNow run over whatever files currently exist."""
    views = spark.readStream.schema(_VIEW_SCHEMA).parquet(vsrc)
    clicks = spark.readStream.schema(_CLICK_SCHEMA).parquet(csrc)
    (
        attribution_join(views, clicks, how=how)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(out))
        .start()
        .awaitTermination()
    )


def test_attribution_pairs_survive_checkpoint_restart(spark):
    """Backlog split across two query STARTS (same checkpoint): run 1 sees
    only batch-1 files, terminates cleanly; batch-2 files land; run 2
    resumes from the checkpoint. The u2 pair (view 10:50 / click 11:05)
    can only be produced from view state restored across the restart."""
    work = tempfile.mkdtemp(prefix="mc2m_ssjoin_restart_")
    vsrc, csrc = f"{work}/views", f"{work}/clicks"
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    spark.createDataFrame(_VIEWS_B1, _VIEW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    spark.createDataFrame(_CLICKS_B1, _CLICK_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt)

    run1 = {
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert run1 == {("v1", "c1")}, run1

    spark.createDataFrame(_VIEWS_B2, _VIEW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    spark.createDataFrame(_CLICKS_B2, _CLICK_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt)

    rows = spark.read.parquet(out).collect()
    pairs = [(r["view_id"], r["click_id"]) for r in rows]
    # exact set AND no duplicate emissions across the restart
    assert set(pairs) == _EXPECTED, pairs
    assert len(pairs) == len(_EXPECTED), pairs
    # delay semantics carried through
    delays = {(r["view_id"], r["click_id"]): r["delay_sec"] for r in rows}
    assert delays[("v2", "c2")] == 15 * 60


def test_attribution_restart_is_idempotent_on_no_new_data(spark):
    """A third start with NO new files must emit nothing (commit log
    honored — a replayed batch would duplicate pairs in the sink)."""
    work = tempfile.mkdtemp(prefix="mc2m_ssjoin_idem_")
    vsrc, csrc = f"{work}/views", f"{work}/clicks"
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    spark.createDataFrame(_VIEWS_B1, _VIEW_SCHEMA).write.parquet(vsrc)
    spark.createDataFrame(_CLICKS_B1, _CLICK_SCHEMA).write.parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt)
    first = sorted(
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    )
    _drain_once(spark, vsrc, csrc, out, ckpt)
    again = sorted(
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == first


def test_attribution_join_batch_twin_matches_streamed(spark):
    """attribution_join on plain batch inputs (watermarks no-op) produces
    the same pair set — the factored helper keeps plan parity between the
    catalog query, its oracle, and these tests."""
    v = spark.createDataFrame(_VIEWS_B1 + _VIEWS_B2, _VIEW_SCHEMA)
    c = spark.createDataFrame(_CLICKS_B1 + _CLICKS_B2, _CLICK_SCHEMA)
    got = {
        (r["view_id"], r["click_id"])
        for r in attribution_join(v, c).collect()
    }
    assert got == _EXPECTED


def test_outer_attribution_unmatched_rows_across_restart(spark):
    """Left-outer twin of the restart test (VERDICT r5 ask #6). The
    never-clicked view v0 (09:00) expires BETWEEN the two runs: its
    30-min join window closes at 09:30, past run 1's watermark
    (min(10:50, 10:10) - 1h = 09:10) but under the final one
    (min(11:10, 11:20) - 1h = 10:10) — it must emit EXACTLY ONCE, with
    null click columns, and only in run 2. v3/v5 are also never-clicked but their
    windows (10:30 / 11:10) are NOT closed under the final watermark:
    a bounded-state engine must withhold them — on an unbounded stream
    they could still match. Matched pairs (incl. the cross-restart v2/
    c2) behave exactly as in the inner form."""
    import tempfile as _tf

    work = _tf.mkdtemp(prefix="mc2m_ssjoin_outer_restart_")
    vsrc, csrc = f"{work}/views", f"{work}/clicks"
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    views_b1 = _VIEWS_B1 + [("v0", _ts("9:00"), "u9")]
    spark.createDataFrame(views_b1, _VIEW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    spark.createDataFrame(_CLICKS_B1, _CLICK_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt, how="left_outer")

    run1 = {
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert run1 == {("v1", "c1")}, run1  # v0 not yet expired in run 1

    spark.createDataFrame(_VIEWS_B2, _VIEW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(vsrc)
    spark.createDataFrame(_CLICKS_B2, _CLICK_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt, how="left_outer")

    rows = spark.read.parquet(out).collect()
    pairs = [(r["view_id"], r["click_id"]) for r in rows]
    expected = _EXPECTED | {("v0", None)}
    assert set(pairs) == expected, pairs
    assert len(pairs) == len(expected), pairs  # no duplicate emissions
    null_row = next(r for r in rows if r["view_id"] == "v0")
    assert null_row["click_ts"] is None and null_row["delay_sec"] is None
    assert null_row["user_id"] == "u9" and null_row["view_ts"] == _ts("9:00")


def test_outer_attribution_batch_twin_includes_unmatched(spark):
    """On batch inputs the left-outer helper is a plain left join: ALL
    never-clicked views appear with nulls (no watermark cutoff — batch
    has complete knowledge). This is the semantic the streaming form
    converges to as the watermark passes every view's window."""
    v = spark.createDataFrame(
        _VIEWS_B1 + _VIEWS_B2 + [("v0", _ts("9:00"), "u9")], _VIEW_SCHEMA
    )
    c = spark.createDataFrame(_CLICKS_B1 + _CLICKS_B2, _CLICK_SCHEMA)
    rows = attribution_join(v, c, how="left_outer").collect()
    got = {(r["view_id"], r["click_id"]) for r in rows}
    assert got == _EXPECTED | {("v0", None), ("v3", None), ("v5", None)}


def test_outer_attribution_expiry_boundary_is_strict(spark):
    """Pins the exact expiry inequality the catalog oracle encodes: with
    max view 11:10 / max click 11:20, the min-policy watermark is 10:10,
    and an unmatched view emits iff view_ts + 30min < 10:10 STRICTLY —
    window closing at 10:09 emits, at exactly 10:10 (== watermark) and
    10:11 it is withheld. If a Spark upgrade ever flips this to <=, this
    test fails before the driver's oracle hash does."""
    import tempfile as _tf

    work = _tf.mkdtemp(prefix="mc2m_ssjoin_boundary_")
    vsrc, csrc = f"{work}/views", f"{work}/clicks"
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    views = [
        ("vA", _ts("9:39"), "ua"),   # closes 10:09 < 10:10 -> emits
        ("vB", _ts("9:40"), "ub"),   # closes 10:10 == wm   -> withheld
        ("vC", _ts("9:41"), "uc"),   # closes 10:11 > wm    -> withheld
        ("vMax", _ts("11:10"), "um"),
    ]
    clicks = [("cMax", _ts("11:20"), "uz")]
    spark.createDataFrame(views, _VIEW_SCHEMA).coalesce(1).write.parquet(vsrc)
    spark.createDataFrame(clicks, _CLICK_SCHEMA).coalesce(1).write.parquet(csrc)
    _drain_once(spark, vsrc, csrc, out, ckpt, how="left_outer")

    got = {
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("vA", None)}, got
