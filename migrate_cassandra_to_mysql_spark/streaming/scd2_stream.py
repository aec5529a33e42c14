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

The applied-generation high-water mark is tracked EXPLICITLY (it used
to be inferred from max(valid_from) over current/, which never advances
on a deletion-only or no-change generation — an older generation
arriving after a deletion-only one would re-fold out of order and
resurrect deleted keys, and a generation deleting every entity left the
inferred mark None and wedged the stream):

  - meta/watermark.txt — the max applied generation, written (atomic
    tmp+rename) after each batch's data writes complete. Advances on
    EVERY kind of generation, including deletion-only and no-change.
  - meta/inflight.json — the exact generation list of the batch
    currently folding, written BEFORE its data writes. On crash replay
    it distinguishes "this generation is in-doubt, refold it"
    (idempotent, and required for current/ to converge) from "this is
    an out-of-order older delivery, skip it" — timestamps alone cannot
    tell those apart inside the crash window.
  - max(valid_from) over current/ still participates as a candidate, so
    stores written before the meta layer existed (or with meta/ lost)
    keep their old guarantees.

Skip rule per generation g:  apply iff  g > max(meta, current-derived)
AND (g ∈ inflight OR g > max(inflight)).  A fully-applied batch replays
as a no-op; a torn batch (crash between the closed/ and current/
writes, or before the meta write) refolds exactly its own in-doubt
generations; an older generation delivered after a later one is never
applied.
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators.lineage import (
    free_local_checkpoint,
)
from migrate_cassandra_to_mysql_spark.operators.merge import (
    scd2_apply_increment,
    scd2_init,
)
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import (
    snapshot_stream,
)

_ARCHIVE_PART = "__archive__"


def _meta_path(store_dir: str) -> str:
    return os.path.join(store_dir, "meta", "watermark.txt")


def _inflight_path(store_dir: str) -> str:
    return os.path.join(store_dir, "meta", "inflight.json")


def _atomic_write(path: str, content: str) -> None:
    """tmp + rename: a concurrent reader sees the old or the new file,
    never a torn one."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)


def _read_meta_watermark(store_dir: str) -> str | None:
    try:
        with open(_meta_path(store_dir)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def _advance_meta_watermark(store_dir: str, wm: str) -> None:
    """Monotonic: never moves the durable high-water mark backwards."""
    cur = _read_meta_watermark(store_dir)
    if cur is not None and _ts_key(cur) >= _ts_key(wm):
        return
    _atomic_write(_meta_path(store_dir), wm)


def _write_inflight(store_dir: str, gens: list[str]) -> None:
    import json

    _atomic_write(_inflight_path(store_dir), json.dumps({"gens": gens}))


def _read_inflight(store_dir: str) -> list[str]:
    import json

    try:
        with open(_inflight_path(store_dir)) as f:
            return list(json.load(f)["gens"])
    except (FileNotFoundError, ValueError, KeyError):
        return []


def _closed_partition_watermark(store_dir: str) -> str | None:
    """Max generation timestamp among closed/'s __vto partition DIRECTORY
    names (percent-decoded) — free to compute at any history size. Used
    only by the compactor to persist watermark evidence before archiving
    erases the partition names; NOT a skip candidate (inside the torn
    crash window the closed partition exists while current/ is stale, and
    the refold must NOT be skipped). The compactor's __archive__
    partition is not a generation."""
    closed = os.path.join(store_dir, "closed")
    if not os.path.isdir(closed):
        return None
    vals = [
        unquote(d.split("=", 1)[1])
        for d in os.listdir(closed)
        if d.startswith("__vto=")
    ]
    vals = [v for v in vals if v != _ARCHIVE_PART]
    return max((_ts_key(v) for v in vals), default=None)


def _checkpoint_has_uncommitted(checkpoint_dir: str) -> bool:
    """True iff the stream checkpoint recorded an offset batch with no
    matching commit — i.e. the next start() will REPLAY a batch."""

    def _ids(sub: str) -> set[int]:
        d = os.path.join(checkpoint_dir, sub)
        if not os.path.isdir(d):
            return set()
        return {int(n) for n in os.listdir(d) if n.isdigit()}

    return bool(_ids("offsets") - _ids("commits"))


def _seed_meta_from_closed(store_dir: str, checkpoint_dir: str) -> None:
    """One-time upgrade for stores written BEFORE the meta layer: if the
    last pre-meta generation was deletion-only, the current-derived
    watermark sits below it (deletions add no current rows), so a late
    older generation could still re-fold and resurrect deleted keys
    (ADVICE r8). The closed layer's __vto partition names DO record that
    generation (it closed the deleted rows), so seed meta/watermark.txt
    from them — but ONLY when meta/inflight.json is absent AND the
    checkpoint has no batch to replay: inside a torn crash window the
    in-doubt generation's closed partition exists while current/ is
    stale, and seeding would skip the refold current/ needs. A store
    with any meta record already made this decision with full
    information and is left alone."""
    if _read_meta_watermark(store_dir) is not None:
        return
    if os.path.exists(_inflight_path(store_dir)):
        return
    if _checkpoint_has_uncommitted(checkpoint_dir):
        return
    wm = _closed_partition_watermark(store_dir)
    if wm is not None:
        _advance_meta_watermark(store_dir, wm)


def applied_watermark(spark: SparkSession, store_dir: str) -> str | None:
    """The store's applied-generation high-water mark: max of the durable
    meta record and the current-slice-derived mark (see module
    docstring); None only for a store that has never applied a
    generation. Normalized via _ts_key, so directly comparable."""
    cands: list[str] = []
    meta = _read_meta_watermark(store_dir)
    if meta is not None:
        cands.append(_ts_key(meta))
    if os.path.isdir(os.path.join(store_dir, "current")):
        w = (
            spark.read.parquet(f"{store_dir}/current")
            .agg(
                F.max(
                    F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
                ).alias("w")
            )
            .collect()[0]["w"]
        )
        if w is not None:
            cands.append(_ts_key(w))
    return max(cands, default=None)


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
    _seed_meta_from_closed(store_dir, checkpoint_dir)
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
            # Skip rule (module docstring): gens at/below the applied
            # high-water mark are already applied (or no-ops) — a
            # fully-applied batch replays as a no-op; gens above it are
            # applied only if they are this store's own in-doubt batch
            # (crash replay — refold is idempotent and REQUIRED for
            # current/ to converge) or genuinely new (above everything
            # ever started). An older generation delivered after a
            # later one matches neither and is skipped — re-folding it
            # would resurrect keys the later generation deleted.
            wm = applied_watermark(spark, store_dir)
            if wm is not None:
                gens = [g for g in gens if _ts_key(g) > wm]
            inflight = {_ts_key(g) for g in _read_inflight(store_dir)}
            if inflight:
                started = max(inflight)
                gens = [
                    g
                    for g in gens
                    if _ts_key(g) in inflight or _ts_key(g) > started
                ]
            hist = spark.read.parquet(f"{store_dir}/current")
            applied_max = gens[-1] if gens else None
            all_applied = list(gens)
        else:
            if not gens:
                processed.append((batch_id, []))
                return
            first, gens = gens[0], gens[1:]
            hist = scd2_init(snap(first), key_cols, tracked_cols, t0=first)
            applied_max = gens[-1] if gens else first
            all_applied = [first, *gens]
        # In-doubt record BEFORE any data write: a crash replay consults
        # it to refold exactly these generations and nothing older.
        if all_applied:
            _write_inflight(store_dir, all_applied)
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
        # Both writes consumed the checkpoint — free its executor blocks
        # so a long-running stream doesn't accumulate one batch's worth
        # of storage per drain (DataFrame.unpersist can't release
        # localCheckpoint blocks; see operators/lineage).
        free_local_checkpoint(hist)
        # Durable high-water mark LAST: every earlier crash window is
        # covered by the data-derived candidates in applied_watermark;
        # this write is what makes no-change generations skip on replay
        # of LATER batches and what survives archive compaction.
        if applied_max is not None:
            _advance_meta_watermark(store_dir, applied_max)
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

    # Archiving folds the per-generation partitions into __archive__,
    # which would erase the closed-layer watermark evidence a
    # deletion-only generation left behind — persist it to meta FIRST so
    # applied_watermark never regresses across a compaction.
    closed_wm = _closed_partition_watermark(store_dir)
    if closed_wm is not None:
        _advance_meta_watermark(store_dir, closed_wm)

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
