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
    # torn state: current/ rewound to the g1 bootstrap
    g1_hist = scd2_init(
        _gen_df(spark, G1).drop("snapshot_date"), ["k"], ["city", "tier"], G1
    )
    g1_hist.write.mode("overwrite").parquet(f"{st}/current")
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
