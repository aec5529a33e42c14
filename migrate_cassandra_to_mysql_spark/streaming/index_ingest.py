"""Streaming ingestion into the persisted serving indexes — the
continuous form of the daily append+compact loop.

The batch maintenance path (operators/inverted_index.append_to_inverted_
index, operators/ivf_index.append_to_ivfpq_index) assumes someone batches
the new documents. Production corpora arrive as a stream of files; this
module drains them through Structured Streaming (AvailableNow trigger +
checkpoint, the snapshot_stream discipline) straight into the index
layouts.

Exactly-once contract — stronger than plain append: a foreachBatch
handler can crash AFTER writing but BEFORE the checkpoint commits, and
Structured Streaming then REPLAYS the batch. A mode('append') write would
duplicate every posting in the replayed batch. Instead each micro-batch
writes under its own partition — postings/(bucket, ingest_batch=<id>),
doclens/(ingest_batch=<id>) — with DYNAMIC partition overwrite, so a
replay rewrites exactly its own partitions and converges to the same
bytes (the same idempotent-replay trick the reference gets from uk_file_id
+ INSERT IGNORE, re-derived for file layouts; Delta/Iceberg get it from
txn logs). Query semantics are unchanged: readers select named columns,
so the extra ingest_batch partition column is invisible to bm25_search,
and the derived lexicon/stats layers refresh once per drain, not per
micro-batch.

Maintenance composes: compact_ingested_postings merges each bucket's
accumulated ingest_batch partitions back into a single ingest_batch=0
layout (zero shuffle, rename-swap). Run it while ingest is quiescent —
the same operational contract as any maintenance window: a replay of an
uncommitted batch whose partitions were just merged would re-create them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.operators import inverted_index as inv
from migrate_cassandra_to_mysql_spark.streaming.snapshot_stream import (
    snapshot_stream,
)


def stream_docs_into_inverted_index(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    n_buckets: int = inv.DEFAULT_BUCKETS,
    text_col: str = "text",
) -> list[int]:
    """Drain all available document files from source_dir into the
    inverted-index layout at index_dir, exactly once per file across
    restarts. Returns the batch ids processed this run (empty on a
    no-new-data restart — the derived layers are then left untouched).

    Per micro-batch: one inversion job (the same encode_postings the
    batch paths use, so rows are bit-identical), one dynamic-overwrite
    partitioned write per layer. Derived lexicon/stats rebuild ONCE
    after the drain — O(index), not O(batches)."""
    processed: list[int] = []

    def handle(df: DataFrame, batch_id: int) -> None:
        postings, doclens = inv.encode_postings(df, n_buckets, text_col)
        (
            postings.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "ingest_batch")
            .parquet(f"{index_dir}/postings")
        )
        (
            doclens.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{index_dir}/doclens")
        )
        processed.append(batch_id)

    snapshot_stream(spark, source_dir, checkpoint_dir, handle)
    if processed:
        inv._refresh_derived(spark, index_dir)
    return processed


def stream_vectors_into_ivfpq_index(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_dir: str,
) -> list[int]:
    """Drain embedding files into a persisted IVFADC index (codebooks
    must already exist — build_ivfpq_index trains/freezes them; streaming
    only ever encodes with the frozen codebooks, the same contract as
    append_to_ivfpq_index). Each micro-batch's codes land under
    (cell, ingest_batch=<id>) with dynamic partition overwrite — the same
    idempotent-replay exactly-once as the document path. Returns batch
    ids processed this run."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.operators import similarity as sim

    cell_centroids, centers = ivf_index.load_ivfpq_codebooks(
        spark, index_dir
    )
    residual = ivf_index.load_ivfpq_residual_flag(spark, index_dir)
    processed: list[int] = []

    def handle(df: DataFrame, batch_id: int) -> None:
        (
            sim.ivfpq_encode(df, cell_centroids, centers, residual=residual)
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "ingest_batch")
            .parquet(f"{index_dir}/codes")
        )
        processed.append(batch_id)

    snapshot_stream(spark, source_dir, checkpoint_dir, handle)
    return processed


def compact_ingested_codes(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """compact_ingested_postings' twin for a streamed IVFADC index:
    codes/cell=N/ingest_batch=* collapses into cell=N/ingest_batch=0.
    Zero shuffle, rename-swap, quiescent-ingest contract."""
    import concurrent.futures as _cf
    import glob as _glob
    import os as _os

    from migrate_cassandra_to_mysql_spark.operators.layout import (
        swap_live_dir,
    )

    def _one(cell_dir: str) -> dict:
        name = _os.path.basename(cell_dir)
        files_in = [
            p
            for p in _glob.glob(f"{cell_dir}/ingest_batch=*/part-*")
            if _os.path.isfile(p)
        ]
        total = sum(_os.path.getsize(p) for p in files_in)
        n_out = max(1, -(-total // target_file_bytes))
        out = f"{index_dir}/codes.new/{name}/ingest_batch=0"
        (
            spark.read.parquet(cell_dir)
            .drop("ingest_batch")
            .coalesce(n_out)
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .parquet(out)
        )
        return {
            "files_in": len(files_in),
            "files_out": len(
                [p for p in _glob.glob(f"{out}/part-*") if _os.path.isfile(p)]
            ),
        }

    cell_dirs = sorted(
        d
        for d in _glob.glob(f"{index_dir}/codes/cell=*")
        if _os.path.isdir(d)
    )
    agg = {"files_in": 0, "files_out": 0, "partitions": 0}
    with _cf.ThreadPoolExecutor(max_workers=8) as ex:
        for res in ex.map(_one, cell_dirs):
            agg["files_in"] += res["files_in"]
            agg["files_out"] += res["files_out"]
            agg["partitions"] += 1
    swap_live_dir(index_dir, "codes")
    return agg


def compact_ingested_postings(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Merge a streamed index's per-batch partitions: every
    postings/bucket=N/ingest_batch=* collapses into bucket=N/
    ingest_batch=0 (and doclens/ingest_batch=* likewise), bin-packed to
    ~target-size files. Zero shuffle (per-bucket coalesce), rename-swap,
    query results unchanged (pinned in tests). Quiescent-ingest contract:
    see module docstring."""
    import concurrent.futures as _cf
    import glob as _glob
    import os as _os

    from migrate_cassandra_to_mysql_spark.operators.layout import (
        swap_live_dir,
    )

    def _one(bucket_dir: str) -> dict:
        name = _os.path.basename(bucket_dir)
        files_in = [
            p
            for p in _glob.glob(f"{bucket_dir}/ingest_batch=*/part-*")
            if _os.path.isfile(p)
        ]
        total = sum(_os.path.getsize(p) for p in files_in)
        n_out = max(1, -(-total // target_file_bytes))
        out = f"{index_dir}/postings.new/{name}/ingest_batch=0"
        (
            spark.read.parquet(bucket_dir)
            .drop("ingest_batch")
            .coalesce(n_out)
            .sortWithinPartitions("tok", "doc_id")
            .write.mode("overwrite")
            .parquet(out)
        )
        return {
            "files_in": len(files_in),
            "files_out": len(
                [p for p in _glob.glob(f"{out}/part-*") if _os.path.isfile(p)]
            ),
        }

    bucket_dirs = sorted(
        d
        for d in _glob.glob(f"{index_dir}/postings/bucket=*")
        if _os.path.isdir(d)
    )
    # Concurrent submission (layout.compact_partitioned rationale): the
    # per-bucket jobs are tiny; threads drive submission only.
    agg = {"files_in": 0, "files_out": 0, "partitions": 0}
    with _cf.ThreadPoolExecutor(max_workers=8) as ex:
        for res in ex.map(_one, bucket_dirs):
            agg["files_in"] += res["files_in"]
            agg["files_out"] += res["files_out"]
            agg["partitions"] += 1
    swap_live_dir(index_dir, "postings")
    (
        spark.read.parquet(f"{index_dir}/doclens")
        .drop("ingest_batch")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/doclens.new/ingest_batch=0")
    )
    swap_live_dir(index_dir, "doclens")
    return agg
