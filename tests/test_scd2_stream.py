"""Streaming SCD2 store (streaming/scd2_stream.py): streamed generation
folds must equal the batch fold chain, closed partitions must be written
once and never rewritten, restarts must be no-ops, and re-delivered
generations must be skipped by the watermark."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.merge import (
    scd2_apply_increment,
    scd2_init,
)
from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
    load_scd2_store,
    stream_scd2_fold,
)

G1, G2, G3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"

# (gen, key, city, tier): key 1 changes each gen; key 2 stable; key 3
# deleted at g2 and re-inserted at g3; key 4 inserted at g2.
ROWS = [
    (G1, 1, "rome", "a"),
    (G1, 2, "oslo", "b"),
    (G1, 3, "lima", "c"),
    (G2, 1, "rome", "A"),
    (G2, 2, "oslo", "b"),
    (G2, 4, "kiev", "d"),
    (G3, 1, "bern", "A"),
    (G3, 2, "oslo", "b"),
    (G3, 3, "lima", "c2"),
    (G3, 4, "kiev", "d"),
]


def _gen_df(spark, g):
    return spark.createDataFrame(
        [r for r in ROWS if r[0] == g],
        "snapshot_date string, k long, city string, tier string",
    )


def _rows(df):
    return sorted(
        (
            r["k"],
            r["city"],
            r["tier"],
            str(r["valid_from"]),
            str(r["valid_to"]),
            r["is_current"],
        )
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("scd2s")
    src, ckpt, st = (str(root / p) for p in ("src", "ckpt", "store"))
    runs = []
    # drain 1: generations 1+2 in one batch; drain 2: generation 3
    _gen_df(spark, G1).unionByName(_gen_df(spark, G2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    runs.append(
        stream_scd2_fold(
            spark, src, ckpt, st, ["k"], ["city", "tier"]
        )
    )
    closed_files_after_1 = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{st}/closed/__vto=*/part-*")
    }
    _gen_df(spark, G3).coalesce(1).write.mode("append").parquet(src)
    runs.append(
        stream_scd2_fold(
            spark, src, ckpt, st, ["k"], ["city", "tier"]
        )
    )
    return {
        "src": src,
        "ckpt": ckpt,
        "st": st,
        "runs": runs,
        "closed_1": closed_files_after_1,
    }


def test_streamed_equals_batch_fold_chain(spark, store):
    hist = scd2_init(
        _gen_df(spark, G1).drop("snapshot_date"), ["k"], ["city", "tier"], G1
    )
    hist = scd2_apply_increment(
        hist,
        _gen_df(spark, G2).drop("snapshot_date"),
        ["k"],
        ["city", "tier"],
        G2,
    )
    hist = scd2_apply_increment(
        hist,
        _gen_df(spark, G3).drop("snapshot_date"),
        ["k"],
        ["city", "tier"],
        G3,
    )
    assert _rows(load_scd2_store(spark, store["st"])) == _rows(hist)


def test_closed_partitions_never_rewritten(spark, store):
    """The unbounded layer is append-only: drain 2 (generation 3) must
    not touch the files generation 2 closed."""
    for p, mtime in store["closed_1"].items():
        assert os.path.getmtime(p) == mtime, p
    # and generation 3's closures landed in their own partition
    vtos = {
        os.path.basename(d)
        for d in glob.glob(f"{store['st']}/closed/__vto=*")
    }
    assert any(G2.replace(":", "%3A") in v or G2 in v for v in vtos)
    assert any(G3.replace(":", "%3A") in v or G3 in v for v in vtos)


def test_restart_without_new_data_is_noop(spark, store):
    before = _rows(load_scd2_store(spark, store["st"]))
    runs = stream_scd2_fold(
        spark, store["src"], store["ckpt"], store["st"], ["k"], ["city", "tier"]
    )
    assert runs == []
    assert _rows(load_scd2_store(spark, store["st"])) == before


def test_redelivered_generation_skipped_by_watermark(spark, store):
    """A late re-delivery of generation 2 (new file, same data) must be
    skipped by the current slice's watermark — the store is unchanged
    and the run reports zero applied generations."""
    before = _rows(load_scd2_store(spark, store["st"]))
    _gen_df(spark, G2).coalesce(1).write.mode("append").parquet(store["src"])
    runs = stream_scd2_fold(
        spark, store["src"], store["ckpt"], store["st"], ["k"], ["city", "tier"]
    )
    assert len(runs) == 1 and runs[0][1] == []
    assert _rows(load_scd2_store(spark, store["st"])) == before


def test_crash_between_closed_and_current_write_converges(spark, store, tmp_path):
    """Simulate the torn-write window: build a store where closed/ has
    generation 2's partition but current/ is still pre-generation-2,
    then drain a batch containing generation 2. The refold must
    OVERWRITE the closed partition with identical rows (no duplicates)
    and produce the converged current slice."""
    src, ckpt, st = (str(tmp_path / p) for p in ("src", "ckpt", "st"))
    # full fold of g1+g2 -> copy closed/, but reset current/ to g1-only
    _gen_df(spark, G1).unionByName(_gen_df(spark, G2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    converged = _rows(load_scd2_store(spark, st))
    # torn state: current/ rewound to the g1 bootstrap. The meta
    # watermark is written AFTER the data writes, so in the real crash
    # window it still reads G1 — rewind it too (inflight, written
    # BEFORE the data writes, correctly lists the in-doubt batch).
    g1_hist = scd2_init(
        _gen_df(spark, G1).drop("snapshot_date"), ["k"], ["city", "tier"], G1
    )
    g1_hist.write.mode("overwrite").parquet(f"{st}/current")
    with open(f"{st}/meta/watermark.txt", "w") as f:
        f.write(G1)
    # replay generation 2 through a FRESH checkpoint (same files)
    runs = stream_scd2_fold(
        spark, src, str(tmp_path / "ckpt2"), st, ["k"], ["city", "tier"]
    )
    assert len(runs) == 1 and runs[0][1] == [G2]
    assert _rows(load_scd2_store(spark, st)) == converged


def test_archive_compaction_then_further_generations(spark, tmp_path):
    """compact_scd2_closed merges the per-generation partitions into
    __vto=__archive__ without changing the loaded history, and a LATER
    generation still drains cleanly next to the archive."""
    from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
        compact_scd2_closed,
    )

    src, ckpt, st = (str(tmp_path / p) for p in ("src", "ckpt", "st"))
    _gen_df(spark, G1).unionByName(_gen_df(spark, G2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    before = _rows(load_scd2_store(spark, st))
    stats = compact_scd2_closed(spark, st)
    assert stats["partitions_in"] >= 1
    assert stats["files_out"] <= stats["files_in"]
    vtos = {
        os.path.basename(d) for d in glob.glob(f"{st}/closed/__vto=*")
    }
    assert vtos == {"__vto=__archive__"}
    assert _rows(load_scd2_store(spark, st)) == before
    # generation 3 drains into a fresh real-timestamp partition
    _gen_df(spark, G3).coalesce(1).write.mode("append").parquet(src)
    runs = stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    assert runs[0][1] == [G3]
    vtos = {
        os.path.basename(d) for d in glob.glob(f"{st}/closed/__vto=*")
    }
    assert "__vto=__archive__" in vtos and len(vtos) == 2
    # final history equals the full batch chain
    hist = scd2_init(
        _gen_df(spark, G1).drop("snapshot_date"), ["k"], ["city", "tier"], G1
    )
    for g in (G2, G3):
        hist = scd2_apply_increment(
            hist,
            _gen_df(spark, g).drop("snapshot_date"),
            ["k"],
            ["city", "tier"],
            g,
        )
    assert _rows(load_scd2_store(spark, st)) == _rows(hist)


G15 = "2024-01-15 00:00:00"  # between G1 and G2


def test_deletion_only_generation_blocks_late_older_resurrection(
    spark, tmp_path
):
    """A deletion-only generation changes nothing in current/, so the old
    current-derived watermark never advanced past it — an OLDER
    generation delivered afterwards was re-folded out of order and
    resurrected the deleted key. The durable meta watermark must block
    it."""
    src, ckpt, st = (str(tmp_path / p) for p in ("src", "ckpt", "st"))
    g1 = spark.createDataFrame(
        [(G1, 1, "rome", "a"), (G1, 2, "oslo", "b")],
        "snapshot_date string, k long, city string, tier string",
    )
    # G2: key 2 deleted, key 1 UNCHANGED — deletion-only generation.
    g2 = spark.createDataFrame(
        [(G2, 1, "rome", "a")],
        "snapshot_date string, k long, city string, tier string",
    )
    g1.coalesce(1).write.mode("append").parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    g2.coalesce(1).write.mode("append").parquet(src)
    runs = stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    assert runs == [(1, [G2])]
    after_delete = _rows(load_scd2_store(spark, st))
    cur_keys = {
        r[0] for r in after_delete if r[5]
    }  # is_current
    assert cur_keys == {1}
    # Late OLDER generation G1.5 re-asserting key 2: must be skipped.
    g15 = spark.createDataFrame(
        [(G15, 1, "rome", "a"), (G15, 2, "oslo", "b")],
        "snapshot_date string, k long, city string, tier string",
    )
    g15.coalesce(1).write.mode("append").parquet(src)
    runs = stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    assert len(runs) == 1 and runs[0][1] == []
    assert _rows(load_scd2_store(spark, st)) == after_delete


def test_torn_deletion_only_batch_refolds_and_converges(spark, tmp_path):
    """Crash window for a DELETION-ONLY batch: closed/ already holds the
    generation's partition but current/ (and the meta watermark) are
    pre-batch. The replay must refold that exact generation — skipping
    it would leave the deleted key current forever — while a later
    out-of-order older delivery is still blocked."""
    src, ckpt, st = (str(tmp_path / p) for p in ("src", "ckpt", "st"))
    g1 = spark.createDataFrame(
        [(G1, 1, "rome", "a"), (G1, 2, "oslo", "b")],
        "snapshot_date string, k long, city string, tier string",
    )
    g2 = spark.createDataFrame(
        [(G2, 1, "rome", "a")],
        "snapshot_date string, k long, city string, tier string",
    )
    g1.coalesce(1).write.mode("append").parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    g2.coalesce(1).write.mode("append").parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    converged = _rows(load_scd2_store(spark, st))
    # Rewind current/ and meta to pre-G2 (closed/__vto=G2 stays — the
    # exact state a crash between the two data writes leaves behind;
    # inflight.json correctly lists [G2]).
    pre = scd2_init(
        g1.drop("snapshot_date"), ["k"], ["city", "tier"], G1
    )
    pre.write.mode("overwrite").parquet(f"{st}/current")
    with open(f"{st}/meta/watermark.txt", "w") as f:
        f.write(G1)
    runs = stream_scd2_fold(
        spark, src, str(tmp_path / "ckpt2"), st, ["k"], ["city", "tier"]
    )
    applied = [g for _, gs in runs for g in gs]
    assert applied == [G2]
    assert _rows(load_scd2_store(spark, st)) == converged


def test_applied_watermark_guards_empty_and_missing_layers(spark, tmp_path):
    """applied_watermark must return None (not raise) on a store whose
    current/ is EMPTY and has no meta — the state that used to wedge
    every subsequent drain with a TypeError."""
    from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
        applied_watermark,
    )

    st = str(tmp_path / "st")
    empty = spark.createDataFrame(
        [],
        "k long, city string, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    empty.write.mode("overwrite").parquet(f"{st}/current")
    assert applied_watermark(spark, st) is None
    # and a drain over such a store applies its generations instead of
    # crashing
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    g2 = spark.createDataFrame(
        [(G2, 9, "kiev", "d")],
        "snapshot_date string, k long, city string, tier string",
    )
    g2.coalesce(1).write.mode("append").parquet(src)
    runs = stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    assert runs == [(0, [G2])]


def test_pre_meta_store_seeds_watermark_from_closed(spark, tmp_path):
    """One-time upgrade for stores written before the meta layer
    (ADVICE r8): after a deletion-only generation, such a store has no
    durable watermark and its current-derived mark sits below the
    deletion — a late older generation would resurrect the deleted key.
    Stream start must seed meta from the closed layer's __vto partition
    names (which DO record the deletion generation) when there is no
    inflight record and no batch to replay."""
    import shutil

    src, ckpt, st = (str(tmp_path / p) for p in ("src", "ckpt", "st"))
    g1 = spark.createDataFrame(
        [(G1, 1, "rome", "a"), (G1, 2, "oslo", "b")],
        "snapshot_date string, k long, city string, tier string",
    )
    g2 = spark.createDataFrame(
        [(G2, 1, "rome", "a")],
        "snapshot_date string, k long, city string, tier string",
    )
    g1.coalesce(1).write.mode("append").parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    g2.coalesce(1).write.mode("append").parquet(src)
    stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    after_delete = _rows(load_scd2_store(spark, st))
    # simulate a store written before the meta layer existed
    shutil.rmtree(f"{st}/meta")
    g15 = spark.createDataFrame(
        [(G15, 1, "rome", "a"), (G15, 2, "oslo", "b")],
        "snapshot_date string, k long, city string, tier string",
    )
    g15.coalesce(1).write.mode("append").parquet(src)
    runs = stream_scd2_fold(spark, src, ckpt, st, ["k"], ["city", "tier"])
    assert len(runs) == 1 and runs[0][1] == []
    assert _rows(load_scd2_store(spark, st)) == after_delete
    from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
        _read_meta_watermark,
        _ts_key,
    )

    assert _ts_key(_read_meta_watermark(st)) >= _ts_key(G2)


def test_meta_seeding_declines_inside_crash_or_replay_windows(tmp_path):
    """_seed_meta_from_closed must NOT seed when the evidence is
    ambiguous: an inflight record or an uncommitted checkpoint batch
    means the newest closed partition may be a torn write whose refold
    current/ still needs — seeding would skip it."""
    import json

    from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
        _read_meta_watermark,
        _seed_meta_from_closed,
        _ts_key,
    )

    st, ckpt = str(tmp_path / "st"), str(tmp_path / "ckpt")
    os.makedirs(f"{st}/closed/__vto={G2.replace(' ', '%20')}")
    # uncommitted batch in the checkpoint: decline
    os.makedirs(f"{ckpt}/offsets")
    os.makedirs(f"{ckpt}/commits")
    open(f"{ckpt}/offsets/0", "w").close()
    _seed_meta_from_closed(st, ckpt)
    assert _read_meta_watermark(st) is None
    # committed checkpoint but an inflight record: decline
    open(f"{ckpt}/commits/0", "w").close()
    os.makedirs(f"{st}/meta", exist_ok=True)
    with open(f"{st}/meta/inflight.json", "w") as f:
        json.dump({"gens": [G2]}, f)
    _seed_meta_from_closed(st, ckpt)
    assert _read_meta_watermark(st) is None
    # clean state: seeds from the closed partition names
    os.unlink(f"{st}/meta/inflight.json")
    _seed_meta_from_closed(st, ckpt)
    assert _ts_key(_read_meta_watermark(st)) == _ts_key(G2)
    # an existing meta record is never overwritten by seeding
    with open(f"{st}/meta/watermark.txt", "w") as f:
        f.write(G3)
    _seed_meta_from_closed(st, ckpt)
    assert _read_meta_watermark(st) == G3
