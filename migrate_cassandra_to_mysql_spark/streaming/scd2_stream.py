"""Continuously-maintained SCD2 dimension store — streaming snapshot
generations folded into a persisted version history.

The batch fold (operators/merge.scd2_apply_increment) costs one
key-shuffle of (current ∪ snapshot) per generation and never reshuffles
closed history. This module carries that property all the way into the
STORAGE layer for a streaming feed of snapshot files:

  store/current/                    open versions (entity-count sized)
  store/closed/__vto=<ts>/          rows closed by generation <ts> —
                                    written once, NEVER rewritten

Per micro-batch: fold each contained generation in ascending
snapshot-date order, then (a) newly-closed rows land in their
generation's own __vto partition via DYNAMIC partition overwrite, and
(b) current/ is rewritten (it is entity-bounded, not history-bounded).
At 100 TB the closed partitions — the unbounded part — are append-only
forever; each re-sync rewrites only the bounded current slice.

Exactly-once under crash replay, with NO ledger, by construction:

  - The fold's input is the CURRENT slice only (closed rows are identity
    passthrough in scd2_apply_increment, so they stay on disk and never
    enter the plan). Everything the fold closes is newly closed.
  - Generations at or below the current slice's own watermark
    (max valid_from — the last generation that changed anything) are
    skipped, so a fully-applied batch replays as a no-op.
  - A replay after a crash BETWEEN the closed write and the current
    write re-folds from the pre-batch current slice and regenerates the
    exact same closed rows; dynamic overwrite rewrites those __vto
    partitions with identical bytes rather than duplicating them.
  - t_new comes from the DATA (the snapshot_date column), never the
    wall clock, which is what makes replays deterministic.

Contract: generation files must arrive in nondecreasing snapshot-date
order (inherent to SCD2 — an older snapshot cannot be folded into a
newer history; a late-arriving older generation is skipped by the
watermark, loudly visible in the returned per-batch generation lists).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.merge import (
    scd2_apply_increment,
    scd2_init,
)
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import (
    snapshot_stream,
)


def load_scd2_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The full version history (closed ∪ current) as one frame, with
    the partition helper column stripped."""
    cur = spark.read.parquet(f"{store_dir}/current")
    if os.path.isdir(f"{store_dir}/closed"):
        closed = spark.read.parquet(f"{store_dir}/closed").drop("__vto")
        return closed.unionByName(cur)
    return cur


def stream_scd2_fold(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    key_cols: list[str],
    tracked_cols: list[str],
    date_col: str = "snapshot_date",
) -> list[tuple[int, list[str]]]:
    """Drain snapshot-generation files from source_dir into the SCD2
    store, exactly once per file across restarts. A micro-batch may span
    several generations (several distinct `date_col` values); they fold
    in ascending order — the distinct-dates collect is control-plane
    sized (generations, not rows). The first batch ever bootstraps the
    store with scd2_init on its earliest generation. Returns
    [(batch_id, [generations actually applied]), ...] for this run."""
    processed: list[tuple[int, list[str]]] = []

    def handle(df: DataFrame, batch_id: int) -> None:
        gens = sorted(
            str(r["d"])
            for r in df.select(F.col(date_col).alias("d")).distinct().collect()
        )
        snap_cols = [*key_cols, *tracked_cols]

        def snap(g: str) -> DataFrame:
            return df.where(
                F.col(date_col).cast("string") == g
            ).select(*snap_cols)

        if os.path.isdir(f"{store_dir}/current"):
            cur = spark.read.parquet(f"{store_dir}/current")
            # Watermark: the last generation that changed anything. Gens
            # at/below it are already applied (or no-ops) — skip, which
            # is what makes a fully-applied batch replay a no-op.
            wm = cur.agg(
                F.max(F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss"))
                .alias("w")
            ).collect()[0]["w"]
            gens = [g for g in gens if _ts_key(g) > _ts_key(wm)]
            hist = cur
        else:
            if not gens:
                processed.append((batch_id, []))
                return
            first, gens = gens[0], gens[1:]
            hist = scd2_init(snap(first), key_cols, tracked_cols, t0=first)
        for g in gens:
            hist = scd2_apply_increment(
                hist, snap(g), key_cols, tracked_cols, t_new=g
            )
        # The fold READS current/ and we are about to OVERWRITE it —
        # materialize first (classic self-overwrite hazard), truncating
        # lineage while at it (multi-generation batches nest the fold).
        hist = hist.localCheckpoint(eager=True)
        # Input was the current slice only, so every non-current row in
        # the fold output was closed by THIS batch's generations.
        newly_closed = hist.where(~F.col("is_current"))
        if not newly_closed.isEmpty():
            (
                newly_closed.withColumn(
                    "__vto",
                    F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__vto")
                .parquet(f"{store_dir}/closed")
            )
        hist.where(F.col("is_current")).write.mode("overwrite").parquet(
            f"{store_dir}/current"
        )
        processed.append((batch_id, list(gens)))

    snapshot_stream(spark, source_dir, checkpoint_dir, handle)
    return processed


def compact_scd2_closed(
    spark: SparkSession,
    store_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Archive maintenance for the closed layer: years of per-generation
    __vto partitions (one tiny directory per re-sync) merge into a
    bin-packed __vto=__archive__ partition. valid_to stays a data column,
    so load_scd2_store is unchanged; future generations keep writing
    their own real-timestamp __vto partitions next to the archive and
    dynamic overwrite never touches it (its partition value can never
    equal a generation timestamp). Zero shuffle (coalesce of input
    splits), rename-swap, and the quiescent-ingest contract of the other
    compactors: run while no drain is in flight. Returns {files_in,
    files_out, partitions_in}."""
    import glob as _glob
    import os as _os

    from migrate_cassandra_to_mysql_spark.operators.layout import (
        swap_live_dir,
    )

    files_in = [
        p
        for p in _glob.glob(f"{store_dir}/closed/__vto=*/part-*")
        if _os.path.isfile(p)
    ]
    n_parts = len(_glob.glob(f"{store_dir}/closed/__vto=*"))
    total = sum(_os.path.getsize(p) for p in files_in)
    n_out = max(1, -(-total // target_file_bytes))
    (
        spark.read.parquet(f"{store_dir}/closed")
        .drop("__vto")
        .coalesce(n_out)
        .sortWithinPartitions("valid_to")
        .write.mode("overwrite")
        .parquet(f"{store_dir}/closed.new/__vto=__archive__")
    )
    swap_live_dir(store_dir, "closed")
    files_out = len(
        [
            p
            for p in _glob.glob(f"{store_dir}/closed/__vto=*/part-*")
            if _os.path.isfile(p)
        ]
    )
    return {
        "files_in": len(files_in),
        "files_out": files_out,
        "partitions_in": n_parts,
    }


def _ts_key(s: str) -> str:
    """Normalize 'YYYY-MM-DD' and 'YYYY-MM-DD HH:MM:SS' spellings onto
    one comparable key (a bare date sorts as its midnight)."""
    return s if " " in s else f"{s} 00:00:00"
