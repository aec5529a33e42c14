"""Physical-plan regression tests: the plans we want at 100 TB, not just
plans that pass. Guards pushdown, broadcast choice, and Python-free hot
paths against refactoring regressions."""

from __future__ import annotations

from migrate_cassandra_to_mysql_spark.plans import catalog


def _plan(spark, sf_dir, name: str) -> str:
    df = catalog.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "snapshot_sanitize")
    # Only the 5 needed orders columns should be read, not the full table.
    assert "ReadSchema" in plan
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "o_orderkey" in scan_line
    assert "o_totalprice" in scan_line


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation/region/customer side
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_anti_join_is_a_join_not_a_collect(spark, sf_dir):
    plan = _plan(spark, sf_dir, "missing_ids_anti_join")
    assert "LeftAnti" in plan


def test_no_python_udfs_in_relational_paths(spark, sf_dir):
    for name in (
        "snapshot_sanitize",
        "q1_pricing_summary",
        "token_range_counts",
        "text_stats",
        "minhash_lsh_candidates",
        "embedding_topk_cosine",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort


def test_pivot_declared_values_single_aggregate(spark, sf_dir):
    """Declared pivot values: no extra distinct-scan job; pivotfirst runs
    inside a regular partial+final HashAggregate pair."""
    plan = _plan(spark, sf_dir, "pivot_status_by_year")
    assert "pivotfirst" in plan
    # One scan only — an undeclared pivot would have planned a second
    # FileScan job just to enumerate the pivot keys.
    assert plan.count("FileScan parquet") == 1


def test_unpivot_is_one_expand_one_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "unpivot_part_measures")
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # Column pruning reaches the scan: only the 3 unpivoted columns read.
    assert "ReadSchema: struct<p_partkey:bigint,p_size:int,p_retailprice:double>" in scan_line


def test_moving_frames_share_one_window_sort(spark, sf_dir):
    """All four window functions (row_number, trailing count/sum,
    cumulative sum) must share a single partition+sort: one Window node,
    one Exchange, one Sort."""
    plan = _plan(spark, sf_dir, "moving_order_spend")
    assert plan.count("Window [") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") == 1


def test_function_showcases_are_python_free(spark, sf_dir):
    for name in ("regexp_showcase", "array_hof_showcase", "corr_covar_stats"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert plan.count("FileScan parquet") == 1, name


def test_ivfpq_single_shuffle_and_broadcast(spark, sf_dir):
    """IVFADC scale contract: encode/assign/probe all ride the scans
    (no exchange below the scoring join), the query side broadcasts,
    and the ONLY hash exchange is the per-query top-k window — capped
    map-side by a partial WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "embedding_ivfpq_topk")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_rejects_duplicate_registration():
    """A duplicate catalog name must fail at import time, not desync a
    composition suite at parity time (the r6 near-miss)."""
    import pytest as _pytest

    from migrate_cassandra_to_mysql_spark.plans.registry import register

    with _pytest.raises(ValueError, match="duplicate catalog registration"):
        @register("snapshot_sanitize")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_gap_fill_two_data_exchanges_no_python(spark, sf_dir):
    """events_gap_fill's contract: (user, hour) pre-agg + per-user span
    collect are the ONLY data shuffles; grid expansion is map-side
    generates. A third hashpartitioning exchange means someone added a
    join or window to the fill path."""
    plan = _plan(spark, sf_dir, "events_gap_fill")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # range transform + chunk split (r7 span bound) + bucket explode —
    # all map-side Generates, no new exchange
    assert plan.count("Generate") == 3


def test_bm25_single_row_broadcast_and_take_ordered(spark, sf_dir):
    """bm25_topk_search: corpus never hash-shuffles — stats reduce to one
    row (SinglePartition exchange) and ride back broadcast; the ordered
    exchange is TakeOrdered only."""
    plan = _plan(spark, sf_dir, "bm25_topk_search")
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "Exchange SinglePartition" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """events_dpp_prune (r7): the probe dates are runtime-only, so the
    fact scan must carry a dynamicpruning subquery in its
    PartitionFilters — Catalyst prunes the date directories at execution
    from the broadcast dim, with no static filter available."""
    plan = _plan(spark, sf_dir, "events_dpp_prune")
    fact_scans = [
        l
        for l in plan.splitlines()
        if "FileScan parquet" in l and "mc2m_dpp_" in l
    ]
    assert fact_scans
    assert any("dynamicpruning" in l for l in fact_scans), plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_rerank_broadcast_fetch_no_python(spark, sf_dir):
    """embedding_rerank_topk (r7): the ADC shortlist and the query frame
    must BROADCAST against the corpus for the exact-cosine fetch — the
    corpus never sort-merge-joins — and the whole path stays JVM-side."""
    plan = _plan(spark, sf_dir, "embedding_rerank_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_divergence_token_shuffle_plus_broadcast(spark, sf_dir):
    """corpus_divergence: token-level (lang, tok) groupBys and the
    languages-sized final agg — totals must come back as a BROADCAST
    join, never a shuffled one."""
    plan = _plan(spark, sf_dir, "corpus_divergence")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_perplexity_lm_broadcasts_and_python_free(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bigram_lm_perplexity")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # prefix/vocab dims


def test_session_window_single_shuffle(spark, sf_dir):
    """Native session_window: ONE user_id exchange feeds the session
    merge — no per-user sort-window pass, no second shuffle."""
    plan = _plan(spark, sf_dir, "events_session_window_native")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan  # no window operator, it's a hash agg path


def test_zorder_rollup_integer_codegen(spark, sf_dir):
    plan = _plan(spark, sf_dir, "zorder_curve_rollup")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # bucket width rides as a broadcast nested-loop of the 1-row max
    assert "BroadcastNestedLoopJoin" in plan
