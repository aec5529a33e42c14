"""Persisted IVF index: train once, lay the corpus out by cell, prune at
query time.

operators/similarity.ivf_topk computes cell assignment inline on every
query — right for a one-shot, wrong for a served corpus. At the 100 TB
design point the index is built ONCE (codebook fit + cell assignment +
corpus rewrite partitioned by cell) and each query then reads only its
probe cells: the cell filter collapses to parquet PartitionFilters, so a
1000-executor query touches n_probe/k of the data instead of all of it.
This mirrors the reference's token-range layout discipline (contiguous
ranges = prunable scan units, snapshot_use_pyspark.py:107-137) applied
to vector search.

Layout under index_dir:
  codebook/            k rows (c_id, cv) — the trained centroids
  corpus/cell=N/...    full vectors, hive-partitioned by nearest centroid

The codebook is pluggable: first-k (deterministic, SQL-oracle-able) or a
k-means fit from operators/kmeans.py (farthest-point init + Lloyd
iterations, still deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.functions.vectors import cosine
from migrate_cassandra_to_mysql_spark.functions.localframe import local_frame
from migrate_cassandra_to_mysql_spark.operators import kmeans as km


def _base(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _nearest_cells(vectors: DataFrame, codebook: DataFrame, n: int) -> DataFrame:
    """Top-n nearest centroids per vector (cosine, 6-dp rounded, tie on
    c_id) — broadcast cross join + window rank, map-side per input row."""
    scored = vectors.crossJoin(F.broadcast(codebook)).select(
        vectors["*"],
        "c_id",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("c_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= n)
        .drop("c_sim")
    )


def first_k_codebook(embeddings: DataFrame, k: int) -> DataFrame:
    """Deterministic stand-in codebook: the k lowest-vec_id vectors."""
    return _base(embeddings).where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )


def kmeans_codebook(
    embeddings: DataFrame, k: int, n_iter: int = 3, init: str = "farthest-point"
) -> DataFrame:
    """Trained codebook: k-means fit (see operators/kmeans.py). Centroid
    ids are re-numbered 0..k-1 in vec_id order of the init points so cell
    directory names are stable and dense."""
    spark = embeddings.sparkSession
    e = _base(embeddings)
    if init == "farthest-point":
        rows = km.init_farthest_point(e, k)
    else:
        rows = km.init_first_k(e, k)
    cents = rows
    for _ in range(n_iter):
        cent_df = local_frame(
            spark,
            [(int(r["c_id"]), list(r["cv"])) for r in cents],
            "c_id long, cv array<double>",
        )
        assigned = km._assign(e, cent_df)
        cents = km._update(assigned, cents)
    renumbered = [
        (i, list(r["cv"]))
        for i, r in enumerate(sorted(cents, key=lambda r: r["c_id"]))
    ]
    return local_frame(spark, renumbered, "c_id long, cv array<double>")


def build_ivf_index(
    embeddings: DataFrame, index_dir: str, codebook: DataFrame
) -> None:
    """Assign every vector to its nearest centroid and persist:
    codebook/ (k rows) + corpus/ hive-partitioned by cell. The corpus
    write is one shuffle-free map stage plus the partitioned write."""
    assigned = _nearest_cells(_base(embeddings), codebook, 1).select(
        "vec_id", "v", F.col("c_id").alias("cell")
    )
    codebook.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebook")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{index_dir}/corpus"
    )


def load_codebook(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(f"{index_dir}/codebook")


def build_ivfpq_index(
    embeddings: DataFrame,
    index_dir: str,
    cell_centroids: list | None = None,
    centers: list | None = None,
    residual: bool | None = None,
    n_cells: int = 8,
    m: int = 8,
    n_centers: int = 16,
    n_iter: int = 2,
) -> None:
    """Persist the IVFADC layout — the production 100 TB vector-serving
    shape (Jégou et al. 2011 §IV composed with the token-range layout
    discipline above): PQ CODES hive-partitioned by IVF cell, plus both
    codebooks. Unlike build_ivf_index's corpus/ (full vectors), codes/
    carries m small ints per vector — 64× less IO per probed cell — and
    the cell partitioning still collapses probe filters to parquet
    PartitionFilters. The encode (operators/similarity.ivfpq_encode) is
    the same map-side expression chain the inline oracle-checked search
    uses, so on-disk codes are bit-identical to the inline path's.

    Layout under index_dir:
      cells/           n_cells rows (c_id, cv) — IVF coarse centroids
      pq/              m*n_centers rows (mi, j, cv) — PQ sub-codebooks
      codes/cell=N/ingest_batch=B/... (vec_id, codes array<int>) — batch
                       build/append write B=0; streaming micro-batch B
                       writes B+1 (uniform leaf depth across all writers)
      meta/            1 row (residual) — the encoding mode, persisted so
                       append and search can never diverge from the build

    SERVING DEFAULT (codebooks omitted): TRAINED, RESIDUAL codebooks —
    k-means IVF cells (kmeans.train_centroid_vectors) plus a PQ codebook
    trained on the residual corpus (similarity.residual_frame +
    pq_train_centers), residual encoding on. On the clustered recall
    fixture this is the measured ladder's top rung (recall@5 0.55 vs
    0.37 raw-trained vs 0.28 first-K; 0.94 with exact re-rank —
    tests/test_ann_recall.py). First-K codebooks remain available by
    passing them explicitly — the catalog rows do, for DuckDB oracle
    replayability — and explicit-codebook builds keep residual=False
    unless asked, exactly as before.

    residual=True stores residual codes (x - centroid[cell], the
    IVFADC-proper form — pair with a residual-trained PQ codebook from
    similarity.residual_frame + pq_train_centers); the flag rides in
    meta/ and every later append/search applies the matching encoding
    automatically. residual=None resolves to True when this build trains
    its own PQ codebook and False for caller-supplied codebooks.
    """
    from migrate_cassandra_to_mysql_spark.operators import similarity as sim

    spark = embeddings.sparkSession
    if cell_centroids is None:
        cell_centroids = km.train_centroid_vectors(
            embeddings, k=n_cells, n_iter=max(n_iter, 2)
        )
    if centers is None:
        if residual is None:
            residual = True
        # residual_frame carries a label column for training provenance;
        # a serving corpus without one gets a constant stand-in.
        emb_l = (
            embeddings
            if "label" in embeddings.columns
            else embeddings.withColumn("label", F.lit(0))
        )
        train_input = (
            sim.residual_frame(emb_l, cell_centroids) if residual else emb_l
        )
        centers = sim.pq_train_centers(
            train_input, m=m, n_centers=n_centers, n_iter=n_iter
        )
    residual = bool(residual)
    local_frame(
        spark,
        [(i, list(cv)) for i, cv in enumerate(cell_centroids)],
        "c_id long, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/cells")
    local_frame(
        spark,
        [
            (mi, j, list(centers[mi][j]))
            for mi in range(len(centers))
            for j in range(len(centers[0]))
        ],
        "mi int, j int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/pq")
    local_frame(
        spark, [(bool(residual),)], "residual boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/meta")
    # ingest_batch=0 keeps the batch layer at the SAME leaf depth as
    # streamed micro-batches (streaming/index_ingest.py writes batch B
    # under ingest_batch=B+1) — mixed depths fail partition discovery.
    # Written to .new and promoted, so codes/ is a versioned symlink from
    # the first build and a later compact_codes flips the pointer instead
    # of renaming a real dir out from under an in-flight reader
    # (cells/pq/meta are frozen after build — never swapped — so they
    # stay plain dirs).
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        swap_live_dir,
    )

    (
        sim.ivfpq_encode(embeddings, cell_centroids, centers, residual=residual)
        .withColumn("ingest_batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("cell", "ingest_batch")
        .parquet(f"{index_dir}/codes.new")
    )
    swap_live_dir(index_dir, "codes")
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        commit_live_snapshot,
    )

    commit_live_snapshot(index_dir, ("codes",))


def append_to_ivfpq_index(
    embeddings_new: DataFrame, index_dir: str
) -> None:
    """Incremental IVFADC maintenance: encode NEW vectors with the
    index's stored codebooks and append their codes to the existing
    cell partitions — no rebuild, no touch of existing files. Because
    each vector's (cell, codes) depends only on the frozen codebooks,
    an index built in N appends is file-for-file equivalent in content
    to one built in a single pass (pinned by test). At 100 TB this is
    the daily-ingest path: cost is O(new vectors), not O(corpus); cells
    whose distribution drifts get re-encoded individually (rewrite one
    cell=N directory), never the whole index."""
    from migrate_cassandra_to_mysql_spark.operators import similarity as sim
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        ensure_live_dir,
    )

    spark = embeddings_new.sparkSession
    # Re-adding a TOMBSTONED vec_id supersedes the deletion; the old
    # code rows must be physically gone before the new copy lands, so
    # run the owed purge (compact_codes — which also resets the layer)
    # first. See append_to_inverted_index for the rationale.
    if _vec_tombstone_hits(spark, index_dir, embeddings_new.select("vec_id")):
        compact_codes(spark, index_dir)
    cell_centroids, centers = load_ivfpq_codebooks(spark, index_dir)
    (
        sim.ivfpq_encode(
            embeddings_new,
            cell_centroids,
            centers,
            residual=load_ivfpq_residual_flag(spark, index_dir),
        )
        .withColumn("ingest_batch", F.lit(0))
        .write.mode("append")
        .partitionBy("cell", "ingest_batch")
        # INTO the current live version dir (files only ever appear under
        # a pinned version; see append_to_inverted_index).
        .parquet(ensure_live_dir(index_dir, "codes"))
    )


def compact_codes(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Maintenance pass after N incremental appends and/or streamed
    batches: each codes/cell=N's ingest_batch=* partitions merge into a
    bin-packed cell=N/ingest_batch=0 (append adds one file per batch per
    cell and streaming one partition per micro-batch; probe cost then
    grows with file count). Per-partition coalesce — zero shuffle, cell
    pruning untouched — then rename-swap into place; codebooks are
    frozen so nothing else needs refresh. The append+compact ==
    single-pass-build equivalence is pinned at the QUERY level in
    tests/test_ivf_index.py. Quiescent-ingest contract for streamed
    indexes. Returns compaction stats."""
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        commit_live_snapshot,
        compact_partitioned,
        swap_live_dir,
    )

    deletes = _load_vec_deletes(spark, index_dir)
    stats = compact_partitioned(
        spark,
        f"{index_dir}/codes",
        f"{index_dir}/codes.new",
        target_file_bytes=target_file_bytes,
        sort_within_by=["vec_id"],
        merge_sub_partitions_into="ingest_batch=0",
        # tombstone purge rides the rewrite compaction does anyway
        transform=None
        if deletes is None
        else (
            lambda df: df.join(F.broadcast(deletes), "vec_id", "left_anti")
        ),
    )
    swap_live_dir(index_dir, "codes")
    if deletes is not None:
        (
            local_frame(spark, [], "vec_id long")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{index_dir}/deletes.new")
        )
        swap_live_dir(index_dir, "deletes")
    # ALWAYS re-commit after the codes swap: a manifest left pointing at
    # the pre-compaction version would pin readers there — harmlessly at
    # first (compaction is content-identical), but LATER APPENDS land in
    # the new live version and manifest-pinned readers would miss them.
    import os as _os

    d = f"{index_dir}/deletes"
    commit_live_snapshot(
        index_dir,
        ("codes", "deletes")
        if _os.path.islink(d) or _os.path.isdir(d)
        else ("codes",),
    )
    return stats


def merge_indexes(
    spark: SparkSession,
    src_dirs: "Sequence[str]",
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Consolidate N IVFADC index SHARDS into one index at dst_dir —
    the vector twin of inverted_index.merge_indexes (per-day/per-source
    shards built independently, merged for serving). The merge moves
    CODES, never vectors: no re-encoding, no corpus scan — a vector's
    (cell, codes) is a pure function of the FROZEN codebooks, so codes
    from shards sharing codebooks belong in the same index verbatim.
    Each merged cell is a bin-packed union of the shards' same cell
    (coalesce of input splits — zero shuffle); each shard's own
    tombstones purge during the rewrite, so the merged index equals a
    single build over the union of the shards' live vectors (pinned at
    the query level in tests).

    Loud rejections:
    - codebook mismatch (cells / pq / residual flag differ): codes
      encoded under different codebooks are incomparable — re-encode
      the divergent shard (rebuild with the target codebooks) first;
    - a vec_id in more than one shard after purges (shards must
      partition the corpus).

    Operational contract: shards quiescent during the merge; dst_dir a
    fresh index directory."""
    import os as _os

    from migrate_cassandra_to_mysql_spark.operators.layout import (
        commit_live_snapshot,
        merge_sharded_layer,
        read_parquet_retry,
        swap_live_dir,
    )

    src_dirs = list(src_dirs)
    if not src_dirs:
        raise ValueError("merge_indexes needs at least one source index")
    base_cells, base_centers = load_ivfpq_codebooks(spark, src_dirs[0])
    base_res = load_ivfpq_residual_flag(spark, src_dirs[0])
    for d in src_dirs[1:]:
        cells_d, centers_d = load_ivfpq_codebooks(spark, d)
        if (
            cells_d != base_cells
            or centers_d != base_centers
            or load_ivfpq_residual_flag(spark, d) != base_res
        ):
            raise ValueError(
                f"{d} encodes with different codebooks (cells/pq/"
                f"residual) than {src_dirs[0]} — their codes are "
                "incomparable. Re-encode the divergent shard with the "
                "target codebooks (build_ivfpq_index over its vectors, "
                "passing the target cells/centers) before merging."
            )
    layers = [_resolve_layers(d) for d in src_dirs]
    purges = [
        (
            F.broadcast(
                read_parquet_retry(spark, lay["deletes"]).select("vec_id")
            )
            if "deletes" in lay
            else None
        )
        for lay in layers
    ]

    def _purged(df: DataFrame, i: int) -> DataFrame:
        return (
            df
            if purges[i] is None
            else df.join(purges[i], "vec_id", "left_anti")
        )

    # vec disjointness (cheap: codes rows carry m ints, and the check
    # shuffles only the id column)
    ids = None
    for i, lay in enumerate(layers):
        one = _purged(
            spark.read.parquet(lay["codes"]).select("vec_id"), i
        )
        ids = one if ids is None else ids.unionByName(one)
    dups = (
        ids.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(5)
        .collect()
    )
    if dups:
        raise ValueError(
            "vec_id(s) present in more than one shard (e.g. "
            f"{sorted(int(r['vec_id']) for r in dups)}) — shards must "
            "partition the corpus. Deduplicate (delete_vectors the "
            "copies you don't want) and re-run."
        )

    # frozen control-plane layers copy from shard 0 (verified equal)
    for part in ("cells", "pq", "meta"):
        if _os.path.isdir(f"{src_dirs[0]}/{part}"):
            (
                spark.read.parquet(f"{src_dirs[0]}/{part}")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{dst_dir}/{part}")
            )

    # per-cell code move: the generic zero-shuffle shard move
    # (layout.merge_sharded_layer) — union of the shards' cell=N,
    # purged per shard, bin-packed by listed bytes.
    moved = merge_sharded_layer(
        spark,
        [lay["codes"] for lay in layers],
        f"{dst_dir}/codes.new",
        [(lambda df, i=i: _purged(df, i)) for i in range(len(layers))],
        sort_within_by=("vec_id",),
        target_file_bytes=target_file_bytes,
    )
    agg = {
        "files_in": moved["files_in"],
        "files_out": moved["files_out"],
        "bytes": moved["bytes"],
        "cells": moved["partitions"],
    }
    swap_live_dir(dst_dir, "codes")
    commit_live_snapshot(dst_dir, ("codes",))
    return agg


# In-process cache of the FROZEN index metadata layers (cells/pq/meta
# are written once at build and never swapped — see build_ivfpq_index's
# layout contract). Every ivfpq_search/rerank call was re-running three
# tiny driver-side parquet-collect jobs to reload byte-identical
# codebooks; a serving process caches them in memory exactly like a
# production vector store does. Keyed on the layer directories' inode +
# mtime so a rebuild INTO THE SAME PATH (mode="overwrite" recreates the
# dirs) can never serve stale codebooks. Per-process only — a fresh
# bench/driver invocation always reloads from the parquet inputs.
# Shape (r14 ADVICE — unbounded growth): the dict is keyed by
# (kind, realpath) with the freshness tuple stored BESIDE the value, so
# a rebuild into the same path REPLACES the superseded entry (possibly
# MBs of centroids) instead of accumulating one per (inode, mtime); a
# long-lived serving process that rebuilds repeatedly stays O(live
# indexes), not O(rebuilds).
_CODEBOOK_CACHE: dict = {}


def _frozen_layer_key(index_dir: str, subs: tuple) -> tuple:
    import os

    parts = [os.path.realpath(index_dir)]
    for sub in subs:
        p = f"{index_dir}/{sub}"
        if os.path.isdir(p):
            st = os.stat(p)
            parts.append((sub, st.st_ino, st.st_mtime_ns))
        else:
            parts.append((sub, None, None))
    return tuple(parts)


def _cache_get(kind: str, index_dir: str, subs: tuple):
    """Cached value iff the layer dirs' (inode, mtime_ns) still match."""
    import os

    fresh = _frozen_layer_key(index_dir, subs)
    hit = _CODEBOOK_CACHE.get((kind, os.path.realpath(index_dir)))
    if hit is not None and hit[0] == fresh:
        return hit[1]
    return None


def _cache_put(kind: str, index_dir: str, subs: tuple, value) -> None:
    import os

    _CODEBOOK_CACHE[(kind, os.path.realpath(index_dir))] = (
        _frozen_layer_key(index_dir, subs),
        value,
    )


def load_ivfpq_residual_flag(spark: SparkSession, index_dir: str) -> bool:
    """The index's persisted encoding mode. Indexes built before the
    residual option (no meta/) are raw-encoded by construction."""
    import os

    if not os.path.isdir(f"{index_dir}/meta"):
        return False
    hit = _cache_get("residual", index_dir, ("meta",))
    if hit is not None:
        return hit
    value = bool(
        spark.read.parquet(f"{index_dir}/meta").collect()[0]["residual"]
    )
    _cache_put("residual", index_dir, ("meta",), value)
    return value


def load_ivfpq_codebooks(
    spark: SparkSession, index_dir: str
) -> tuple[list, list]:
    """(cell_centroids, centers) from a persisted IVFADC index —
    control-plane sized by the codebook contract. Cached per process
    (see _CODEBOOK_CACHE): the layers are frozen at build time."""
    hit = _cache_get("codebooks", index_dir, ("cells", "pq"))
    if hit is not None:
        return hit
    cell_rows = spark.read.parquet(f"{index_dir}/cells").collect()
    cell_rows.sort(key=lambda r: r["c_id"])
    cell_centroids = [list(r["cv"]) for r in cell_rows]
    pq_rows = spark.read.parquet(f"{index_dir}/pq").collect()
    m = 1 + max(r["mi"] for r in pq_rows)
    n = 1 + max(r["j"] for r in pq_rows)
    by_mj = {(r["mi"], r["j"]): list(r["cv"]) for r in pq_rows}
    centers = [[by_mj[(mi, j)] for j in range(n)] for mi in range(m)]
    _cache_put("codebooks", index_dir, ("cells", "pq"), (cell_centroids, centers))
    return cell_centroids, centers


def _resolve_layers(index_dir: str) -> dict[str, str]:
    """Snapshot-consistent layer resolution for the codes index: codes,
    plus the tombstone layer once delete_vectors has run (two mutable
    layers must move together — see inverted_index._manifest_layers)."""
    import os as _os

    from migrate_cassandra_to_mysql_spark.operators.layout import (
        resolve_live_snapshot,
    )

    parts = ("codes",)
    d = f"{index_dir}/deletes"
    if _os.path.islink(d) or _os.path.isdir(d):
        parts = ("codes", "deletes")
    return resolve_live_snapshot(index_dir, parts)


def delete_vectors(spark: SparkSession, index_dir: str, vec_ids) -> None:
    """Delete vectors from the persisted IVFADC index — tombstone twin of
    inverted_index.delete_docs (equality-delete shape): vec_ids append to
    a tiny versioned `deletes` layer and a manifest commit makes them
    invisible to every subsequent search atomically; the next
    compact_codes physically purges the code rows and resets the layer.
    Cost now: O(tombstones); no codebook retrain, no cell rewrite (the
    frozen-codebook contract is untouched — deletions only remove
    candidates). Same single-maintainer / quiescent-ingest contract as
    compact_codes. A LATER batch append of a tombstoned vec_id
    supersedes the deletion (append_to_ivfpq_index purges first via
    compact_codes); streaming ingest rejects re-adds loudly instead
    (stream_vectors_into_ivfpq_index).

    Atomicity (r10 ADVICE, same fix as delete_docs): the ENLARGED
    tombstone set is staged in `deletes.new` and promoted via
    swap_live_dir — a NEW version dir — so a reader whose manifest pins
    the previous deletes version keeps the old set until THIS deletion's
    manifest commit; appending into the live version dir instead leaked
    the new tombstones to manifest-pinned readers before the commit.

    Concurrency (r11 ADVICE, same fix as delete_docs): the
    read-enlarge-stage-swap sequence runs under its own `deletes.rmw`
    maintainer lockfile — swap_live_dir's lock guards only the
    promotion, so without this two concurrent deleters could each read
    the same base set and the second swap would silently discard the
    first's tombstones. A second deleter now fails loudly instead."""
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        _maintainer_lock,
        commit_live_snapshot,
        swap_live_dir,
    )

    if not isinstance(vec_ids, DataFrame):
        vec_ids = local_frame(
            spark, [(int(i),) for i in vec_ids], "vec_id long"
        )
    new = vec_ids.select(F.col("vec_id").cast("long"))
    with _maintainer_lock(index_dir, "deletes.rmw", 3600.0):
        existing = _load_vec_deletes(spark, index_dir)
        enlarged = new if existing is None else existing.unionByName(new)
        (
            enlarged.distinct()
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{index_dir}/deletes.new")
        )
        swap_live_dir(index_dir, "deletes")
        commit_live_snapshot(index_dir, ("codes", "deletes"))


def _load_vec_deletes(spark: SparkSession, index_dir: str):
    import os as _os

    d = f"{index_dir}/deletes"
    if not (_os.path.islink(d) or _os.path.isdir(d)):
        return None
    deletes = spark.read.parquet(d).select("vec_id")
    if deletes.isEmpty():
        return None
    return deletes


def _vec_tombstone_hits(
    spark: SparkSession, index_dir: str, ids_df
) -> list[int]:
    """Which of `ids_df`'s vec_ids are currently tombstoned — the vector
    twin of inverted_index._tombstone_hits (broadcast-tombstone
    semi-join probe over the batch, control-plane-sized collect; no
    tombstones -> no jobs)."""
    deletes = _load_vec_deletes(spark, index_dir)
    if deletes is None:
        return []
    return [
        r["vec_id"]
        for r in ids_df.select("vec_id")
        .join(F.broadcast(deletes), "vec_id", "left_semi")
        .distinct()
        .collect()
    ]


def ivfpq_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k per query row (q_id, qv) over the persisted IVFADC
    index. Probe cells come from a map-side literal-codebook expression
    on the query side; the probed set (control-plane sized) becomes a
    literal IN filter that reaches the codes scan as a parquet
    PartitionFilter — unprobed cells' files are never opened, and the
    rows that ARE read carry m code bytes, not d-dim vectors. Scoring is
    a broadcast equi-join on cell + the ADC expression; the only shuffle
    is the per-query top-k window. Same conventions as the inline
    operators, so results equal similarity.ivfpq_topk row-for-row. The
    index's persisted encoding mode (meta/) selects raw or residual ADC
    automatically — a query cannot accidentally score residual codes
    with raw query vectors. The codes read retries through a concurrent
    compact_codes' rename-swap window (layout.read_parquet_retry).

    `allowed` (a vec_id frame) is the FILTERED-search path: a metadata
    predicate evaluated elsewhere (label set, tenant, date range)
    left-semi-joins onto the probed codes scan BEFORE ADC scoring, so
    only admitted candidates are scored and ranked — pre-filtering, the
    semantics every production vector store exposes (post-filtering a
    fixed-k result can starve a selective filter to <k hits). The set
    broadcasts while it fits; Catalyst flips to a shuffled semi-join
    beyond that — either way the codes scan itself stays probe-pruned
    first, filter second, so cost remains O(probed ∩ allowed)."""
    from migrate_cassandra_to_mysql_spark.operators import similarity as sim
    from migrate_cassandra_to_mysql_spark.operators.layout import (
        read_parquet_retry,
    )

    cell_centroids, centers = load_ivfpq_codebooks(spark, index_dir)
    residual = load_ivfpq_residual_flag(spark, index_dir)
    n_centers = len(centers[0])
    sub = len(centers[0][0])
    ranked = sim.ranked_cells_expr("qv", cell_centroids)
    q = queries.select(
        "q_id",
        "qv",
        F.explode(
            F.slice(
                F.transform(ranked, lambda x: x["c"].cast("long")), 1, n_probe
            )
        ).alias("q_cell"),
    )
    probed = [r["q_cell"] for r in q.select("q_cell").distinct().collect()]
    layer = _resolve_layers(index_dir)
    codes = (
        read_parquet_retry(spark, layer["codes"])
        .where(F.col("cell").isin(probed))
        .select("vec_id", "codes", F.col("cell").cast("long").alias("cell"))
    )
    if "deletes" in layer:
        # tombstoned vectors are invisible the moment the delete commits;
        # the physical purge rides the next compact_codes (same manifest
        # discipline as the inverted index, so a reader can never pair
        # purged codes with emptied tombstones or vice versa)
        codes = codes.join(
            F.broadcast(
                read_parquet_retry(spark, layer["deletes"]).select("vec_id")
            ),
            "vec_id",
            "left_anti",
        )
    if allowed is not None:
        codes = codes.join(
            F.broadcast(allowed.select("vec_id")), "vec_id", "left_semi"
        )
    qv_sql = (
        sim._residual_sql("qv", "q_cell", cell_centroids)
        if residual
        else "qv"
    )
    cand = (
        F.broadcast(q)
        .join(codes, F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            "cell",
            sim._adc_expr(centers, n_centers, sub, qv_sql=qv_sql).alias(
                "approx_dist"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("approx_dist"), F.asc("n_id"))
    return cand.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 1,
) -> DataFrame:
    """Top-k cosine neighbors per query row (q_id, qv) over the persisted
    index, probing the n_probe nearest cells per query.

    The probed cell set is collected (control-plane sized: <= k_centroids
    values) and applied as a literal IN filter so it reaches the corpus
    scan as a parquet PartitionFilter — the unprobed cells' files are
    never opened. Candidate scoring is a broadcast join (queries are the
    small side) on cell, then a per-query top-k window.
    """
    codebook = load_codebook(spark, index_dir)
    qv = queries.select(
        F.col("q_id").alias("vec_id"), F.col("qv").alias("v")
    )
    q_cells = _nearest_cells(qv, codebook, n_probe).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("c_id").alias("q_cell"),
    )
    probed = [r["q_cell"] for r in q_cells.select("q_cell").distinct().collect()]
    corpus = (
        spark.read.parquet(f"{index_dir}/corpus")
        .where(F.col("cell").isin(probed))
        .select("vec_id", "v", F.col("cell").cast("long").alias("cell"))
    )
    cand = (
        F.broadcast(q_cells)
        .join(corpus, F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            "cell",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def ivfpq_search_rerank(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    shortlist: int = 20,
    embedding_col: str = "embedding",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """The full production serving composition over the PERSISTED index:
    ADC shortlist from the on-disk codes (probe-pruned, m bytes per
    candidate — ivfpq_search above) + exact-cosine re-rank of only the
    shortlisted candidates' full vectors from `corpus`. This is the
    persisted twin of similarity.ivfpq_rerank_topk (equality pinned by
    test) and the end-to-end recall rung the clustered fixture measures
    at 0.94 with the trained-residual serving default.

    Scale shape: the shortlist (queries x shortlist rows) BROADCASTS
    against the corpus scan for the vector fetch — the corpus never
    shuffles, and at 100 TB the fetch reads only the rows a Bloom/DPP
    filter on vec_id admits; the final exact top-k windows over
    queries x shortlist rows. The corpus stays a caller-supplied frame
    because the index stores codes only — 64x smaller than vectors,
    which is the point of the layout.

    `allowed` pre-filters the ADC shortlist (see ivfpq_search): the
    shortlist is drawn from admitted candidates only, so the exact
    re-rank never wastes its corpus fetches on rows a post-filter would
    discard — and a selective filter still yields k results."""
    from migrate_cassandra_to_mysql_spark.functions.vectors import cosine as _cos

    short = ivfpq_search(
        spark, index_dir, queries, k=shortlist, n_probe=n_probe,
        allowed=allowed,
    ).select("q_id", "n_id")
    vecs = corpus.select(
        F.col("vec_id").alias("n_id"),
        F.col(embedding_col).cast("array<double>").alias("nv"),
    )
    fetched = F.broadcast(short).join(vecs, "n_id")
    scored = fetched.join(
        F.broadcast(queries.select("q_id", "qv")), "q_id"
    ).select(
        "q_id",
        "n_id",
        F.round(_cos(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)


def build_bq_index(
    embeddings: DataFrame, index_dir: str, codebook: DataFrame
) -> None:
    """Binary-quantized IVF index: sign-pack every vector into two
    BIGINT words (functions/vectors.bq_pack_sql — 1 bit/dim, 64x
    compression) and persist the CODES ONLY, hive-partitioned by the
    nearest-centroid cell:

      codebook/          k rows (c_id, cv)
      codes/cell=N/...   (vec_id, w1, w2) — 24 bytes/vector

    Full vectors are NOT stored: the exact re-rank fetches them from
    the base table by vec_id (shortlist-sized, broadcast), which is the
    point of the layout — at 100 TB of vectors the code table is
    ~vectors/8 bytes and the per-cell partitions are small enough to
    pin in executor memory. Encoding is one map-side projection (exact
    integer bit construction off `v[i] >= 0` comparisons, no shuffle
    beyond the partitioned write); the codebook assignment reuses the
    IVF discipline (_nearest_cells: cosine 6-dp, tie on c_id).

    The reference has no vector surface (its scan unit is the token
    range, snapshot_use_pyspark.py:107-137); engine-added
    training-pipeline serving layout, composing the r12 flat BQ row
    (plans/vectorplans.bq_hamming_topk) with the IVF cell pruning of
    build_ivf_index above.
    """
    from migrate_cassandra_to_mysql_spark.functions.vectors import (
        bq_pack_sql,
    )

    assigned = _nearest_cells(_base(embeddings), codebook, 1).select(
        "vec_id",
        F.expr(bq_pack_sql("v", 0)).alias("w1"),
        F.expr(bq_pack_sql("v", 32)).alias("w2"),
        F.col("c_id").alias("cell"),
    )
    codebook.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/codebook"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{index_dir}/codes"
    )


def bq_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int = 30,
) -> DataFrame:
    """Top-k per query over the persisted BQ index: probe the n_probe
    nearest cells (literal IN filter -> parquet PartitionFilters, so
    unprobed cells' code files are never opened), Hamming-shortlist
    within the probed cells only (two XOR+popcount ops per candidate —
    no float math touches anything outside the shortlist), then
    exact-cosine re-rank the shortlist against full vectors fetched
    from `base` by vec_id.

    `queries` is (q_id, qv: array<double>); query words are packed
    inline from qv (identical integer construction as the index build,
    so a corpus row queried against itself has Hamming 0 by identity).

    Determinism: cell probe = cosine 6-dp + c_id tie (the shared
    _nearest_cells order), Hamming exact integer, shortlist total order
    (hamming, n_id), rerank (cos_sim 6-dp DESC, n_id). Output columns
    (q_id, n_id, cell, hamming, cos_sim, rnk) — `cell` is the
    candidate's cell so the oracle can replay the probe set.

    Scale shape: queries broadcast against the pruned codes scan; the
    sole shuffles are the two per-query windows (shortlist, top-k) over
    queries x cell-candidate rows; the base-table fetch broadcasts the
    queries x shortlist frame so the 100 TB vector table never
    shuffles."""
    from migrate_cassandra_to_mysql_spark.functions.vectors import (
        bq_pack_sql,
        cosine as _cos,
    )

    codebook = load_codebook(spark, index_dir)
    qv = queries.select(F.col("q_id").alias("vec_id"), F.col("qv").alias("v"))
    q_cells = (
        _nearest_cells(qv, codebook, n_probe)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.expr(bq_pack_sql("v", 0)).alias("qw1"),
            F.expr(bq_pack_sql("v", 32)).alias("qw2"),
            F.col("c_id").alias("q_cell"),
        )
    )
    probed = [
        r["q_cell"] for r in q_cells.select("q_cell").distinct().collect()
    ]
    codes = (
        spark.read.parquet(f"{index_dir}/codes")
        .where(F.col("cell").isin(probed))
        .select("vec_id", "w1", "w2", F.col("cell").cast("long").alias("cell"))
    )
    cand = (
        F.broadcast(q_cells)
        .join(codes, F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "qv",
            F.col("vec_id").alias("n_id"),
            "cell",
            F.expr(
                "CAST(bit_count(qw1 ^ w1) + bit_count(qw2 ^ w2) AS BIGINT)"
            ).alias("hamming"),
        )
    )
    ws = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("n_id"))
    short = (
        cand.withColumn("srn", F.row_number().over(ws))
        .where(F.col("srn") <= shortlist)
        .drop("srn")
    )
    vecs = base.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    rer = F.broadcast(short).join(vecs, "n_id").select(
        "q_id",
        "n_id",
        "cell",
        "hamming",
        F.round(_cos(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return rer.withColumn(
        "rnk", F.row_number().over(wr).cast("long")
    ).where(F.col("rnk") <= k)
