"""sf1 scale smoke (`pytest -m scale`): the 100 TB story, executed.

Every scale claim so far was design-argued and plan-asserted at <= sf0.1.
This job synthesizes an sf1-equivalent dataset (10x sf0.1 by key-shifted
replication — same value distributions, 10x the rows and distinct keys)
and runs the most expensive headline plans to completion on it, proving
the plans hold through a 10x scale-up with no broadcast cliff, no
driver-side materialization, and no aggregation-buffer blowup.

Excluded from the default suite (pytest.ini addopts `-m "not scale"`):
generation plus the five plans is minutes of wall clock. Run with
`python -m pytest -m scale` (the command-line -m overrides addopts).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.plans import catalog
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

pytestmark = pytest.mark.scale

_SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_COPIES = 10

# The headliners worth smoking at sf1: the five most expensive in
# BENCH_r04/r05 cold, spanning the distinct heavy shapes — sanitize
# expression chain + dedup window (orders), shingle window + posting
# pipeline (documents), minhash band join (documents), tf-idf broadcast +
# windowed top-k (documents), and exact key-dedup (lineitem) — plus the
# r6 incremental SCD2 fold (orders): three full-outer generations whose
# closed-row passthrough must not buffer or shuffle the growing history.
_QUERIES = (
    "snapshot_sanitize",
    "ngram_jaccard_pruned",
    "minhash_lsh_candidates",
    "tfidf_top_terms",
    "dedup_exact_lineitem",
    "scd2_incremental_history",
)


@pytest.fixture(scope="module")
def sf1_dir(spark) -> str:
    """Synthesize sf1 from sf0.1 (migrate_cassandra_to_mysql_spark.
    scale_data — shared with bench.py's measured sf1 block)."""
    from migrate_cassandra_to_mysql_spark.scale_data import synthesize_sf1

    out = tempfile.mkdtemp(prefix="mc2m_sf1_")
    synthesize_sf1(spark, _SRC_SF, out, copies=_COPIES)

    yield out

    import shutil

    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", _QUERIES)
def test_headliner_completes_at_sf1(spark, sf1_dir, name):
    """Each plan must run to completion at sf1 and produce sane output.

    The noop write executes the full distributed plan without collecting
    results; the count() aggregates to one driver-side long. Completion
    under the test session's default driver memory IS the assertion —
    a broadcast of a scaled fact table or a driver-side materialization
    would OOM or hit the 8GB broadcast limit and fail loudly."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    n = df.count()
    assert n > 0, f"{name} returned no rows at sf1"


def test_sf1_scaled_cardinalities(spark, sf1_dir):
    """The synthesized tables really are 10x in rows AND distinct keys."""
    src_docs = T(spark, _SRC_SF, "documents").count()
    sf1_docs = spark.read.parquet(f"{sf1_dir}/documents.parquet")
    assert sf1_docs.count() == _COPIES * src_docs
    assert (
        sf1_docs.select("doc_id").distinct().count() == _COPIES * src_docs
    )


def test_ivfpq_search_completes_at_sf1(spark, sf1_dir):
    """IVFADC at 10× corpus: encode + cell-assign 10× the vectors
    map-side, probe 2 of 4 cells, ADC-score only those cells' codes.
    query_mod is scaled with the corpus so the probe count stays fixed
    while the per-query candidate set grows 10× — the axis that
    actually stresses the scoring join. Completion under default driver
    memory + sane top-k output IS the assertion (a full-corpus scan or
    a vector-carrying candidate side would blow the time/memory budget
    the other five plans establish)."""
    from migrate_cassandra_to_mysql_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    n = emb.count()
    src_n = T(spark, _SRC_SF, "embeddings").count()
    assert n == _COPIES * src_n
    out = ivfpq_topk(
        emb, n_cells=4, m=4, n_centers=4,
        query_mod=src_n,  # ~_COPIES queries across the scaled id space
        k=3, n_probe=2,
    )
    rows = out.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    assert len(per_q) >= 2
    for q, rs in per_q.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))


def test_gap_fill_completes_at_sf1(spark, sf1_dir):
    """LOCF gap fill at 10x users (user_id-shifted event copies): the
    per-user observation-list state must stay bounded by the series span
    (720 hourly buckets for the month of data) regardless of user count —
    completion + full-grid output under default driver memory IS the
    assertion (an unbounded per-user collect or a grid x events join
    would blow up here)."""
    df = catalog.queries()["events_gap_fill"](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    n_users = (
        spark.read.parquet(f"{sf1_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    src_users = T(spark, _SRC_SF, "events").select("user_id").distinct().count()
    assert n_users == _COPIES * src_users


def test_inverted_index_build_and_search_at_sf1(spark, sf1_dir, tmp_path_factory):
    """Invert the 10x corpus and serve a query: the build is one corpus
    scan + bucket-partitioned write; the search must touch only the query
    terms' buckets (pruning asserted on the executed plan) no matter the
    corpus size."""
    from migrate_cassandra_to_mysql_spark.operators import inverted_index
    from migrate_cassandra_to_mysql_spark.plans.textplans import _BM25_TERMS

    d = str(tmp_path_factory.mktemp("sf1_invidx"))
    inverted_index.build_inverted_index(
        spark.read.parquet(f"{sf1_dir}/documents.parquet"), d
    )
    q = inverted_index.bm25_search(spark, d, _BM25_TERMS, k=20)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    rows = q.collect()
    assert len(rows) == 20 and all(r["bm25"] > 0 for r in rows)


def test_pagerank_completes_at_sf1(spark, sf1_dir):
    """PageRank over the 10x co-purchase graph (10x orders with the same
    bounded order width): pair expansion stays O(width^2) per order and
    the iteration loop shuffles only (node, rank) pairs — completion plus
    full node coverage is the assertion."""
    df = catalog.queries()["part_copurchase_pagerank"](spark, sf1_dir)
    out = df.collect()
    assert len(out) > 0
    assert all(r["pagerank"] > 0 for r in out)


def test_zorder_rewrite_completes_at_sf1(spark, sf1_dir, tmp_path_factory):
    """The layout rewriter at 10x lineitem: one range-exchange + local
    sort; completion plus preserved row count under default driver
    memory is the assertion (the min/max normalization must stay a
    broadcast 1-row agg, never a per-row window at this size)."""
    from migrate_cassandra_to_mysql_spark.operators.layout import write_zordered

    li = spark.read.parquet(f"{sf1_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path_factory.mktemp("sf1_zorder"))
    write_zordered(li, out, "l_orderkey", "l_partkey", n_files=32)
    assert spark.read.parquet(out).count() == li.count()


def test_streamed_scd2_store_at_sf1(spark, sf1_dir, tmp_path_factory):
    """The streaming SCD2 store at 10x entity count (r7): two snapshot
    generations (value updates on %10 keys, deletes on %13, inserts on
    %100) drain through stream_scd2_fold, and the resulting store must
    equal the batch scd2_init+apply fold EXACTLY (exceptAll both ways).
    The properties under test at this scale: current/ rewrites stay
    entity-bounded, closed/ lands once, and nothing broadcasts or
    driver-materializes a scaled fact table."""
    from migrate_cassandra_to_mysql_spark.operators.merge import (
        scd2_apply_increment,
        scd2_init,
    )
    from migrate_cassandra_to_mysql_spark.streaming.scd2_stream import (
        load_scd2_store,
        stream_scd2_fold,
    )

    g1t, g2t = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    root = tmp_path_factory.mktemp("scd2sf1")
    src, ckpt, st = (str(root / p) for p in ("src", "ckpt", "store"))

    o = spark.read.parquet(f"{sf1_dir}/orders.parquet")
    key = F.col("o_orderkey")
    s1 = o.select(
        key.alias("file_id"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
    s2 = (
        o.where(key % 13 != 0)
        .select(
            key.alias("file_id"),
            F.when(key % 10 == 0, F.col("o_totalprice") + 1000)
            .otherwise(F.col("o_totalprice"))
            .alias("total"),
            F.when(key % 10 == 0, F.lit("U"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
        )
        .unionByName(
            o.where(key % 100 == 0).select(
                (key + 100000000).alias("file_id"),
                F.col("o_totalprice").alias("total"),
                F.lit("N").alias("status"),
            )
        )
    )
    s1.withColumn("snapshot_date", F.lit(g1t)).write.mode("append").parquet(src)
    runs1 = stream_scd2_fold(
        spark, src, ckpt, st, ["file_id"], ["total", "status"]
    )
    s2.withColumn("snapshot_date", F.lit(g2t)).write.mode("append").parquet(src)
    runs2 = stream_scd2_fold(
        spark, src, ckpt, st, ["file_id"], ["total", "status"]
    )
    assert len(runs1) == 1 and len(runs2) == 1

    streamed = load_scd2_store(spark, st)
    batch = scd2_apply_increment(
        scd2_init(s1, ["file_id"], ["total", "status"], g1t),
        s2,
        ["file_id"],
        ["total", "status"],
        g2t,
    )
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_dup_ngram_spans_completes_at_sf1(spark, sf1_dir):
    """Substring-level dedup at 10x corpus: the gram stream shuffles as
    md5 digests, the frequent-gram build is a partial-agg
    count-distinct, and membership is a semi-join — none of which may
    buffer per-gram text or collect anything driver-side. Completion
    plus structural invariants: spans are non-overlapping and
    non-touching per doc (that is the island rule), every span is at
    least k tokens, and n_grams fits inside the span."""
    from pyspark.sql import Window as W

    df = catalog.queries()["dup_ngram_spans"](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    n = df.count()
    assert n > 0
    assert df.where(F.col("span_tokens") != F.col("span_end") - F.col("span_start")).count() == 0
    assert df.where(F.col("span_tokens") < 5).count() == 0
    assert df.where(
        (F.col("n_grams") < 1)
        | (F.col("n_grams") > F.col("span_tokens") - 4)
    ).count() == 0
    w = W.partitionBy("doc_id").orderBy("span_start")
    overlapping = (
        df.withColumn("nxt", F.lead("span_start").over(w))
        .where(F.col("nxt") <= F.col("span_end"))
        .count()
    )
    assert overlapping == 0


def test_persisted_ivfpq_default_build_and_rerank_at_sf1(
    spark, sf1_dir, tmp_path_factory
):
    """The r9 serving default, end to end at 10x corpus: build the
    persisted IVFADC index with NO caller codebooks (k-means cells +
    residual-trained PQ — the train-once cost a 100 TB deployment pays
    exactly once), then serve both the code-only search and the full
    shortlist+exact-re-rank composition from it. Completion under
    default driver memory + rank-contiguous output per query IS the
    assertion; the corpus side of the re-rank must never shuffle (the
    shortlist broadcasts), or the fetch would blow the budget the
    other sf1 plans establish."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index

    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    src_n = T(spark, _SRC_SF, "embeddings").count()
    d = str(tmp_path_factory.mktemp("sf1_ivfpq"))
    ivf_index.build_ivfpq_index(emb, d, n_cells=4, m=4, n_centers=4)
    assert ivf_index.load_ivfpq_residual_flag(spark, d) is True
    queries = emb.where(F.col("vec_id") % src_n == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    rows = ivf_index.ivfpq_search_rerank(
        spark, d, queries, corpus=emb, k=3, n_probe=2, shortlist=20
    ).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    assert len(per_q) >= 2
    for q, rs in per_q.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True), q


def test_dedup_clusters_completes_at_sf1(spark, sf1_dir):
    """The full near-dedup chain at 10x corpus: MinHash signatures ->
    LSH band join -> connected components -> survivor marking. The
    candidate join must stay band-key bucketed (nothing all-pairs) and
    the component loop must converge with O(1)-deep lineage at 10x the
    pair volume. Invariants: every cluster's survivor is its minimum
    doc_id, exactly one survivor per cluster, and clusters only contain
    docs that shared at least one candidate edge (transitively)."""
    df = catalog.queries()["dedup_clusters"](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    rows = df.collect()
    assert rows
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["component"], []).append(r)
    multi = 0
    for cluster, rs in by_cluster.items():
        survivors = [r for r in rs if r["is_survivor"]]
        assert len(survivors) == 1, cluster
        assert survivors[0]["doc_id"] == min(r["doc_id"] for r in rs)
        assert cluster == min(r["doc_id"] for r in rs)
        if len(rs) > 1:
            multi += 1
    # the sf1 injection produces real multi-member clusters
    assert multi > 0


def test_streamed_index_ingest_at_sf1(spark, sf1_dir, tmp_path_factory):
    """Streaming ingestion at 10x corpus: drain the scaled documents
    into the inverted index in TWO micro-batches (half the corpus
    each), compact the accumulated ingest_batch layers, and the served
    results must equal a single-pass batch build over the same corpus —
    the stream->replay->compact == build equivalence, proven at the
    scale where a buffered inversion or an unpartitioned rewrite would
    blow the budget the batch test establishes."""
    from migrate_cassandra_to_mysql_spark.operators import inverted_index
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _BM25_TERMS,
        _bm25_score_sql,
    )
    from migrate_cassandra_to_mysql_spark.streaming.index_ingest import (
        stream_docs_into_inverted_index,
    )

    root = tmp_path_factory.mktemp("sf1_ingest")
    src, ckpt, idx = (str(root / p) for p in ("src", "ckpt", "idx"))
    docs = spark.read.parquet(f"{sf1_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    for gen in (0, 1):
        docs.where(F.col("doc_id") % 2 == gen).write.mode("append").parquet(
            src
        )
        bids = stream_docs_into_inverted_index(spark, src, ckpt, idx)
        assert len(bids) == 1
    inverted_index.compact_postings(spark, idx)
    full = str(root / "full")
    inverted_index.build_inverted_index(docs, full)
    a = inverted_index.bm25_search(
        spark, idx, _BM25_TERMS, k=20, score_sql=_bm25_score_sql()
    ).toPandas()
    b = inverted_index.bm25_search(
        spark, full, _BM25_TERMS, k=20, score_sql=_bm25_score_sql()
    ).toPandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert (a["bm25"].to_numpy() == b["bm25"].to_numpy()).all()


def test_serving_soaks_through_ingest_and_maintenance_at_sf1(
    spark, sf1_dir, tmp_path_factory
):
    """VERDICT r9 ask #3 — the full operational story at 10x corpus:
    streamed index ingestion, a single-maintainer compact_postings +
    derived-layer refresh pass, and CONTINUOUS bm25 serving reads
    through read_parquet_retry, composed. Serving must (a) never error
    at any point, (b) return non-empty results throughout, and (c)
    return EXACTLY the quiescent answer for every read that overlaps
    the maintenance pass (compaction and refresh are content-identical
    and every read pins the version it resolved), with before/after
    quiescent results equal. Ingest-overlapped reads only assert
    no-error + non-empty — a half-landed micro-batch is transiently
    visible by design until the post-drain refresh."""
    import threading

    from migrate_cassandra_to_mysql_spark.operators import inverted_index
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _BM25_TERMS,
        _bm25_score_sql,
    )
    from migrate_cassandra_to_mysql_spark.streaming.index_ingest import (
        stream_docs_into_inverted_index,
    )

    root = tmp_path_factory.mktemp("sf1_soak")
    src, ckpt, idx = (str(root / p) for p in ("src", "ckpt", "idx"))
    docs = spark.read.parquet(f"{sf1_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def serve():
        return inverted_index.bm25_search(
            spark, idx, _BM25_TERMS, k=20, score_sql=_bm25_score_sql()
        ).toPandas()

    # drain 1: first half of the corpus, then quiesce
    docs.where(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
    assert len(stream_docs_into_inverted_index(spark, src, ckpt, idx)) == 1

    errors: list[BaseException] = []
    served: list = []
    stop = threading.Event()
    first_read = threading.Event()

    def server():
        try:
            while not stop.is_set():
                got = serve()
                assert len(got) > 0
                served.append(got)
                first_read.set()
        except BaseException as e:  # surfaced in the main thread
            errors.append(e)

    # Phase A: serve WHILE the second half streams in
    t = threading.Thread(target=server, daemon=True)
    t.start()
    try:
        assert first_read.wait(timeout=300)
        docs.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(
            src
        )
        assert len(stream_docs_into_inverted_index(spark, src, ckpt, idx)) == 1
    finally:
        stop.set()
        t.join(timeout=300)
    assert not errors, errors
    ingest_reads = len(served)
    assert ingest_reads >= 1

    # Phase B: quiescent anchor over the FULL corpus
    quiescent = serve()
    assert len(quiescent) == 20

    # Phase C: serve WHILE the maintenance pass runs; every overlapping
    # read must equal the quiescent answer exactly
    mismatches: list = []
    errors.clear()
    served.clear()
    stop.clear()
    first_read.clear()

    def strict_server():
        try:
            while not stop.is_set():
                got = serve()
                served.append(got)
                first_read.set()
                if list(got["doc_id"]) != list(quiescent["doc_id"]) or (
                    got["bm25"].to_numpy() != quiescent["bm25"].to_numpy()
                ).any():
                    mismatches.append(got)
        except BaseException as e:
            errors.append(e)

    t = threading.Thread(target=strict_server, daemon=True)
    t.start()
    try:
        assert first_read.wait(timeout=300)
        stats = inverted_index.compact_postings(spark, idx)
        assert stats["files_out"] >= 1
        inverted_index._refresh_derived(spark, idx)
    finally:
        stop.set()
        t.join(timeout=300)
    assert not errors, errors
    assert not mismatches, f"{len(mismatches)} reads diverged"
    assert len(served) >= 1

    # Phase D: final quiescent read equals the pre-maintenance anchor
    final = serve()
    assert list(final["doc_id"]) == list(quiescent["doc_id"])
    assert (final["bm25"].to_numpy() == quiescent["bm25"].to_numpy()).all()


def test_vector_serving_soaks_through_code_compaction_at_sf1(
    spark, sf1_dir, tmp_path_factory
):
    """The vector twin of the serving soak: ivfpq_search_rerank serving
    reads (shortlist from the persisted codes + exact re-rank) hammering
    a trained-default sf1 index WHILE compact_codes collapses its
    appended ingest_batch layers — zero read errors, every overlapping
    read exactly equal to the quiescent answer, before/after equal."""
    import threading

    from migrate_cassandra_to_mysql_spark.operators import ivf_index

    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    d = str(tmp_path_factory.mktemp("sf1_vec_soak"))
    # build from the low-id half of the corpus (training seeds from the
    # first-K vec_ids, which must all be present), append the rest ->
    # multiple ingest_batch layers for the compactor to collapse
    src_n = T(spark, _SRC_SF, "embeddings").count()
    half = src_n * 5  # sf1 = 10 key-shifted copies of the source ids
    ivf_index.build_ivfpq_index(
        emb.where(F.col("vec_id") < half), d, n_cells=4, m=4, n_centers=4
    )
    ivf_index.append_to_ivfpq_index(emb.where(F.col("vec_id") >= half), d)
    queries = emb.where(F.col("vec_id") % src_n == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )

    def serve():
        return (
            ivf_index.ivfpq_search_rerank(
                spark, d, queries, corpus=emb, k=3, n_probe=2, shortlist=20
            )
            .toPandas()
            .sort_values(["q_id", "rnk"])
            .reset_index(drop=True)
        )

    quiescent = serve()
    assert len(quiescent) > 0

    errors: list[BaseException] = []
    mismatches: list = []
    served: list = []
    stop = threading.Event()
    first_read = threading.Event()

    def strict_server():
        try:
            while not stop.is_set():
                got = serve()
                served.append(got)
                first_read.set()
                if not got.equals(quiescent):
                    mismatches.append(got)
        except BaseException as e:
            errors.append(e)

    t = threading.Thread(target=strict_server, daemon=True)
    t.start()
    try:
        assert first_read.wait(timeout=300)
        stats = ivf_index.compact_codes(spark, d)
        assert stats["files_out"] >= 1
    finally:
        stop.set()
        t.join(timeout=300)
    assert not errors, errors
    assert not mismatches, f"{len(mismatches)} reads diverged"
    assert len(served) >= 1
    final = serve()
    assert final.equals(quiescent)


def test_tombstone_delete_lifecycle_at_sf1(spark, sf1_dir, tmp_path_factory):
    """Tombstone deletion at 10x corpus — the right-to-be-forgotten path
    exercised at the scale where its cost model matters: delete_docs over
    a ~1% victim slice must be O(tombstones) + derived refresh (no
    corpus rewrite — asserted by the posting layer's files being
    untouched), victims invisible to serving IMMEDIATELY, and the
    physical purge riding the next compact_postings with served results
    bit-identical across the purge and the tombstone layer reset. The
    served==rebuilt-without-victims equality is pinned by the sf0.01
    driver row (bm25_tombstone_topk) and the unit lifecycle test; what
    sf1 adds is the no-rewrite cost shape and purge stability at 10x."""
    import glob

    from migrate_cassandra_to_mysql_spark.operators import inverted_index
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        _BM25_TERMS,
        _bm25_score_sql,
    )

    d = str(tmp_path_factory.mktemp("sf1_invidx_del"))
    docs = spark.read.parquet(f"{sf1_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    inverted_index.build_inverted_index(docs, d)

    def serve():
        return inverted_index.bm25_search(
            spark, d, _BM25_TERMS, k=20, score_sql=_bm25_score_sql()
        ).toPandas()

    def posting_files():
        return sorted(
            (p, os.path.getsize(p))
            for p in glob.glob(f"{d}/postings/bucket=*/*/part-*")
            if os.path.isfile(p)
        )

    before = serve()
    victims = [int(x) for x in before["doc_id"].head(5)]
    files_before = posting_files()

    inverted_index.delete_docs(spark, d, victims)
    # O(tombstones): the deletion touched ZERO posting files — the same
    # file list (names AND sizes) serves the post-delete reads
    assert posting_files() == files_before
    got = serve()
    assert not (set(got["doc_id"]) & set(victims))

    # purge rides compaction; results unchanged, tombstones reset, rows
    # physically gone from both data layers
    inverted_index.compact_postings(spark, d)
    after = serve()
    assert list(after["doc_id"]) == list(got["doc_id"])
    assert (after["bm25"].to_numpy() == got["bm25"].to_numpy()).all()
    assert spark.read.parquet(f"{d}/deletes").count() == 0
    assert (
        spark.read.parquet(f"{d}/postings")
        .where(F.col("doc_id").isin(victims))
        .count()
        == 0
    )


def test_shard_merge_equals_single_build_at_sf1(
    spark, sf1_dir, tmp_path_factory
):
    """Shard consolidation at 10x: two half-corpus shards (built where
    the data would land) merge by MOVING postings — no corpus re-scan —
    and the merged index must answer the standard query identically to
    a single-pass build over the full 10x corpus, with bucket pruning
    intact on the merged layout."""
    from migrate_cassandra_to_mysql_spark.operators import inverted_index
    from migrate_cassandra_to_mysql_spark.plans.textplans import _BM25_TERMS

    docs = spark.read.parquet(f"{sf1_dir}/documents.parquet")
    a = str(tmp_path_factory.mktemp("sf1_shard_a"))
    b = str(tmp_path_factory.mktemp("sf1_shard_b"))
    m = str(tmp_path_factory.mktemp("sf1_merged"))
    ref = str(tmp_path_factory.mktemp("sf1_single"))
    inverted_index.build_inverted_index(docs.where(F.col("doc_id") % 2 == 0), a)
    inverted_index.build_inverted_index(docs.where(F.col("doc_id") % 2 == 1), b)
    inverted_index.build_inverted_index(docs, ref)
    stats = inverted_index.merge_indexes(spark, [a, b], m)
    assert stats["buckets"] > 0

    def serve(idx):
        q = inverted_index.bm25_search(spark, idx, _BM25_TERMS, k=20)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        return q.toPandas()

    got, want = serve(m), serve(ref)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert (got["bm25"].to_numpy() == want["bm25"].to_numpy()).all()
    s_m = spark.read.parquet(f"{m}/stats").collect()[0]
    s_r = spark.read.parquet(f"{ref}/stats").collect()[0]
    assert (s_m["n_docs"], s_m["sum_dl"]) == (s_r["n_docs"], s_r["sum_dl"])


def test_passage_bm25_completes_at_sf1(spark, sf1_dir):
    """Chunk-level BM25 + per-doc max-pool at 10x: the chunk explode
    multiplies rows, not bytes (token arrays slice in place), the hits
    filter precedes the sole per-doc exchange, and the plan holds its
    two-exchange shape at any corpus size."""
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        passage_bm25_doc_topk,
    )

    q = passage_bm25_doc_topk(spark, sf1_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = q.collect()
    assert len(rows) == 10
    assert all(r["bm25"] > 0 and r["best_chunk_hits"] > 0 for r in rows)


def test_vector_shard_merge_equals_single_build_at_sf1(
    spark, sf1_dir, tmp_path_factory
):
    """IVFPQ shard consolidation at 10x: codes move verbatim between
    same-codebook shards (no re-encode pass), and the merged index
    serves identically to a single build over the full 10x corpus."""
    from migrate_cassandra_to_mysql_spark.operators import ivf_index
    from migrate_cassandra_to_mysql_spark.operators.similarity import (
        first_k_cell_centroids,
        first_k_pq_centers,
    )

    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    cells = first_k_cell_centroids(emb, 4)
    centers = first_k_pq_centers(emb, 4, 4)
    a = str(tmp_path_factory.mktemp("sf1_vshard_a"))
    b = str(tmp_path_factory.mktemp("sf1_vshard_b"))
    m = str(tmp_path_factory.mktemp("sf1_vmerged"))
    ref = str(tmp_path_factory.mktemp("sf1_vsingle"))
    ivf_index.build_ivfpq_index(
        emb.where(F.col("vec_id") % 2 == 0), a, cells, centers
    )
    ivf_index.build_ivfpq_index(
        emb.where(F.col("vec_id") % 2 == 1), b, cells, centers
    )
    ivf_index.build_ivfpq_index(emb, ref, cells, centers)
    stats = ivf_index.merge_indexes(spark, [a, b], m)
    assert stats["cells"] > 0
    q = (
        emb.where(F.col("vec_id") % 1000 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    got = ivf_index.ivfpq_search(spark, m, q, k=5, n_probe=2).toPandas()
    want = ivf_index.ivfpq_search(spark, ref, q, k=5, n_probe=2).toPandas()
    for col in ("q_id", "n_id", "approx_dist", "rnk"):
        assert list(got[col]) == list(want[col]), col


@pytest.mark.parametrize(
    "name", ["cms_heavy_hitters", "weighted_sample_topk", "audio_meta_decode"]
)
def test_late_r10_rows_complete_at_sf1(spark, sf1_dir, name):
    """The late-r10 bounded-resource rows at 10x: the CMS sketch stays
    4096 cells whatever the token volume, the A-ES sample stays k rows
    with zero exchanges, and the WAV decode streams Arrow batches —
    completion under the test session's memory IS the assertion."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() > 0, name


@pytest.mark.parametrize(
    "name",
    [
        "dedup_canonical_keep",
        "rm3_query_expansion_topk",
        "ann_recall_eval",
        "mmr_diversified_topk",
        "lm_dirichlet_topk",
        "sq8_quantized_topk",
        "part_copurchase_triangles",
        "events_ewma_smoothing",
        "copurchase_association_rules",
    ],
)
def test_r11_rows_complete_at_sf1(spark, sf1_dir, name):
    """The r11 rows at 10x: the canonical pick adds one bounded window
    to the LSH chain, RM3's pass 2 joins a 7-row broadcast frame, the
    eval fold is K rows per sampled query, MMR is bounded by N^2
    per query after candidate generation, Dirichlet-LM is the BM25
    two-scan shape, and SQ8's training agg shuffles partitions x dim
    rows regardless of corpus size — completion under the test
    session's memory IS the assertion."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() > 0, name


def test_sparse_cosine_completes_and_stays_bounded_at_sf1(
    spark, sf1_dir
):
    """sparse_cosine_pairs at 10x: the CLAMPED df cap (min(max(n/8,
    64), 1024)) is the load-bearing scale bound — without it the
    synthesis copytokens (df = n/10, just under a relative n/8 cap)
    would fan out (n/10)^2/2 candidate pairs, quadratic in copies.
    Completion with the clamp IS the assertion. The output is EMPTY
    here by honest construction: copy-synthesis scales every term's
    document frequency with the corpus (no Heaps'-law tail of new rare
    terms, unlike real text), so at 10x even the base corpus's rarest
    term exceeds the clamp and the discriminative subspace is empty —
    on real corpora new rare vocabulary keeps entering under the cap."""
    df = catalog.queries()["sparse_cosine_pairs"](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name",
    [
        "kcore_decomposition",
        "bfs_shortest_hops",
        "label_propagation_communities",
        "phrase_proximity_topk",
        # ols_trend_by_nation is absent: the synthesis carries no
        # customer/nation dimensions, and the op is scale-trivial
        # anyway (one fact pass to 25x7 sufficient-statistic rows).
        "matryoshka_ann_eval",
        "bq_hamming_topk",
        # late-r12: seeded teleport over the same uncut ~1.2M-edge
        # co-purchase graph the global-pagerank sf1 smoke walks —
        # personalization changes the teleport vector, not the data
        # movement, and this pins that claim executed at 10x
        "part_copurchase_ppr",
    ],
)
def test_r12_rows_complete_at_sf1(spark, sf1_dir, name):
    """The r12 rows at 10x. The graph trio runs on a ~300x-denser edge
    set than sf0.1 here, and that is the POINT of this smoke: copy
    synthesis replicates every basket 10x, so the support>=2 cut keeps
    ~the raw pair set (~1.2M edges) instead of the ~3.6k real-data
    signal graph — the peel/frontier/label loops execute at genuine
    bulk-graph size (edge-sized shuffles per round, eager per-round
    checkpoints) under the test session's memory. Phrase match stays
    two-term-posting-sized; OLS is two aggregations at any scale; the
    matryoshka/BQ brute-force rows grow with queries x corpus by their
    eval-sample construction (the documented convention — the fixed-
    workload scaling claim lives in the sf5 suite's pinned-query
    tests), and completion here bounds that cost at 10x."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() > 0, name


def test_containment_pairs_completes_at_sf1(spark, sf1_dir):
    """Asymmetric containment dedup at 10x corpus: the df clamp must
    hold the posting self-join's candidate volume (kept shingles fan
    out <= cap^2/2 pairs each), nothing collects driver-side, and the
    injected boilerplate-wrapped copies still surface with the original
    side fully contained (c_ab exactly 1.0) — the semantics are
    scale-invariant by construction."""
    df = catalog.queries()["shingle_containment_pairs"](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    bad = df.where(
        (F.col("n_shared") > F.col("n_sh_a"))
        | (F.col("n_shared") > F.col("n_sh_b"))
        | (F.col("doc_a") >= F.col("doc_b"))
        | (F.col("c_ab") > 1.0)
        | (F.col("c_ba") > 1.0)
    ).count()
    assert bad == 0
    wrapped = df.where(F.col("doc_b") == F.col("doc_a") + 2000000)
    n_wrapped = wrapped.count()
    assert n_wrapped > 0
    assert wrapped.where(F.col("c_ab") != 1.0).count() == 0


@pytest.mark.parametrize(
    "name",
    [
        # the wedge self-join runs over the same uncut ~1.2M-edge
        # copy-dense graph the triangles smoke closes at 10x — wedge
        # volume is sum(deg^2)-bounded exactly like the triangle
        # count, and THAT is the stress this smoke pins
        "copurchase_link_prediction",
        # same two-scan + broadcast-stats shape as the lm_dirichlet
        # smoke above, with the bigram HOFs widening the map side only
        "jm_bigram_lm_topk",
        # cusum_changepoint is absent for the ols_trend reason: the
        # synthesis carries no customer/nation dimensions, and the op
        # is scale-trivial anyway (one fact agg to a few-thousand-row
        # series frame, then KB-sized windows)
    ],
)
def test_r13_rows_complete_at_sf1(spark, sf1_dir, name):
    """The r13 rows at 10x — completion under the test session's
    memory IS the assertion (the fixed-workload scaling claims live in
    the sf5 suite)."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() > 0, name


@pytest.mark.parametrize(
    "name",
    [
        # one user-partitioned window + KB-sized matrix windows; the
        # 10x event stream stresses the shared sessionize/lag sort
        "event_trigram_transitions",
        "session_path_topk",
        # map-side literal-codebook chain + probed-cell broadcast join
        # over the 10x perturbed-copy corpus — the corpus must never
        # shuffle
        "ivf_ip_topk",
        # one map-side count pass collapsing to the 15-cell frame —
        # completion pins that nothing fact-sized survives the agg
        "chi_square_independence",
        # the two-level prefix sum at 10x: in-bucket windows stay
        # bucket-partitioned; only the bucket-totals frame (tens of
        # rows) is single-partition
        "mann_whitney_u",
        # the per-customer lead window at 10x rows per customer (the
        # synthesis keeps o_custkey), then domain-sized duration
        # machinery only — the KM/log-rank pair shares one shape
        "kaplan_meier_repurchase",
        "logrank_repurchase_test",
        # isotonic_trend_by_nation is absent for the ols_trend/cusum
        # reason: the synthesis carries no customer/nation dimensions;
        # the op is scale-trivial anyway (fact collapse to 25 x ~7,
        # then KB-sized minimax joins)
    ],
)
def test_r14_rows_complete_at_sf1(spark, sf1_dir, name):
    """The r14 rows at 10x — completion under the test session's
    memory IS the assertion (the fixed-workload scaling claims live in
    the sf5 suite)."""
    df = catalog.queries()[name](spark, sf1_dir)
    df.write.format("noop").mode("overwrite").save()
    assert df.count() > 0, name
