"""Query catalog registry.

Every engine capability is registered here as a named query:
  - a Spark callable (spark, sf_dir) -> DataFrame, and
  - (when SQL-expressible) a DuckDB oracle SQL string over the pre-registered
    views region/nation/customer/supplier/part/orders/lineitem/events/
    documents/embeddings.

Cross-engine determinism rules applied throughout the catalog (see
tools/check_oracles.py which enforces them):
  1. Money/quantity aggregation goes through DECIMAL casts so sums are
     *exact* and identical in both engines; only the final value is cast to
     DOUBLE (identical bits from identical exact decimals).
  2. Integer sums are cast to BIGINT on both sides (DuckDB sum(BIGINT)
     widens to HUGEINT otherwise).
  3. Every ORDER BY ... LIMIT has a full deterministic tie-break.
  4. Hash bucketing uses md5 (the one hash function both engines share).
  5. Floating-point similarity scores are rounded (8 dp) before ranking.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # A duplicate name would silently overwrite the catalog entry
        # while suite queries that captured the OLD component oracle at
        # import keep calling the NEW shadowing function — a desync that
        # only surfaces as a parity failure. Fail at import instead.
        if name in CATALOG:
            raise ValueError(
                f"duplicate catalog registration: {name!r} "
                f"(existing: {CATALOG[name].fn.__module__})"
            )
        CATALOG[name] = CatalogEntry(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver's correctness harness verifies the FIRST 50 queries in
# catalog order against their DuckDB oracles; everything after rides the
# in-repo parity suite (tools/check_oracles.py + tests/test_oracle_parity,
# which cover ALL entries). PRIORITY curates that 50-slot window: the 25
# bench headline queries, the reference-lifecycle pipeline queries, the
# LLM-data-pipeline operator family (partly via the *_suite wide rows,
# which give several component operators a driver row through one slot),
# and the structurally-distinct TPC-H core. Registration order within
# modules stays meaningful for everything not listed here.
PRIORITY: list[str] = [
    # r9 rotation (VERDICT r8 ask #2 — drive the 15-query
    # never-driver-verified backlog to 0). All 15 incoming are
    # parity-green (in-repo differential at sf0.001/0.01/0.1); every
    # rotated-out query holds green driver rows for >=2 consecutive
    # rounds (r7+r8; several r6 or earlier). Out, with the in-window
    # coverage that retains each family:
    #   q11/q15/q20 (TPC-H tail, green r7+r8 -> q2/q10/q16 + the
    #     incoming q6/q14/q17/q19 + tpch_scalar_suite keep join/agg/
    #     top-k shape breadth; q16 STAYS as the window's anti-join
    #     shape holder), q12 (case-sum agg -> incoming q14's
    #     case-sum-ratio is the same family's unverified shape),
    #   salted_skew_join (bench headliner, green r1-r8 -> the incoming
    #     skew_ab_salted/skew_ab_plain/plain_skew_join A/B trio covers
    #     the salting family more finely; bench.py still times it),
    #   chunk_pack_suite (green r3b-r8 -> incoming doc_chunking +
    #     sequence_packing are its two component operators),
    #   bpe_merge_training (sanctioned rows-only r7+r8 -> incoming
    #     bpe_apply_fixed has a FULL oracle; trainer keeps e2e tests;
    #     window becomes 50/50 oracled),
    #   stratified_sample (green r7+r8 -> incoming deterministic_sample
    #     keeps the reproducible-sampling family),
    #   mode_and_percentile_disc / approx_distinct_stats (green r7+r8
    #     -> corr_covar_stats stays; incoming price_histogram +
    #     parts_catalog_profile keep distribution-stats coverage),
    #   regexp_showcase (green r7+r8 -> incoming json_struct_extract
    #     brings semi-structured extraction; PII regexes ride
    #     doc_signal_suite), array_hof_showcase (green r7+r8 -> HOF
    #     shapes ride doc_chunking/corpus_curation map-side HOFs),
    #   unpivot_part_measures (green r7+r8 -> incoming
    #     parts_catalog_profile profiles the same part-measure domain),
    #   embedding_ivfpq_topk (green r6-r8 -> incoming
    #     embedding_ivfpq_residual_topk strictly generalizes the ADC
    #     path; ivfpq_persisted_topk + embedding_rerank_topk stay),
    #   user_retention_cohorts (green r7+r8 -> funnel_conversion keeps
    #     the cohort/funnel family).
    # r7 rotation (VERDICT r6 ask #1 — burn the never-driver-verified
    # backlog from 34 to <=15). Twenty swaps, the window's largest, all
    # sanctioned by the ask; every rotated-out query holds a green r6
    # driver row (most hold green rows for 4-5 consecutive rounds).
    # Out, with the in-window coverage that retains each family:
    #   token_range_counts, running_max_token (token ring family ->
    #     snapshot_sanitize row + invariant tests), missing_ids_anti_join
    #     (anti-join shape -> q16's NOT IN / counts-distinct shape),
    #   dedup_exact_lineitem (exact dedup -> snapshot_merge_upsert +
    #     dedup_clusters), q1/q3/q5 (TPC-H agg/join core ->
    #     q2/q10/q12/q11/q15/q16/q20 + scalar suite),
    #   events_sessionize (-> events_session_window_native, the native
    #     twin of the same semantics), json_events_agg (JSON family ->
    #     streaming rows parse the same events), text_stats /
    #     doc_fingerprint (-> doc_signal_suite + corpus_curation rows),
    #   embedding_topk_cosine / embedding_ivf_topk (ANN ladder ->
    #     embedding_ivfpq_topk + both persisted serving twins),
    #   order_price_stats (-> corr_covar_stats + scalar suite),
    #   events_cube (-> events_grouping_sets, the same rollup family's
    #     unverified shape), top_ngrams (-> tfidf/bm25 stay out but
    #     bigram_lm_perplexity covers n-gram stats), asof_last_purchase /
    #     range_join_attribution (temporal joins -> events_gap_fill +
    #     streaming_click_attribution_outer), label_centroids (->
    #     stratified_sample + kmeans parity suite), tfidf_top_terms
    #     (-> bm25_topk_search + bm25_persisted_topk).
    # r12: snapshot_sanitize out on its green r1-r11 rows (11
    # consecutive — the window's longest holder). The sanitize
    # projection/NULL-scrub semantics stay driver-gated through
    # snapshot_job_e2e (whose e2e row runs the same sanitize stage
    # inside the full pipeline), bench.py still times it cold+warm
    # every round, and entry() keeps it as the smoke flagship. In:
    # positional phrase + proximity retrieval — the positional-index
    # operator class (Lucene phrase / sloppy-phrase) that bag-of-words
    # BM25 cannot express:
    "phrase_proximity_topk",
    # r10: minhash_lsh_candidates out on its green r1-r9 rows (bench.py
    # still times it cold+warm) to admit the r10-NEW incremental
    # (asymmetric) dedup — new ops earn their driver row in their own
    # round. The incoming row embeds the identical minhash signature +
    # banding construction as its candidate stage, and the dedup family
    # keeps ngram_jaccard_pruned, dup_ngram_spans and dedup_clusters
    # in-window:
    "incremental_dedup_lsh",
    # r12: ngram_jaccard_pruned out on its green r2-r11 rows (10
    # consecutive; bench.py still RAW-gates its warm serve every
    # round). The pairwise-dedup family keeps incremental_dedup_lsh,
    # dup_ngram_spans, sparse_cosine_pairs and dedup_canonical_keep
    # in-window — strictly finer shingle/posting coverage. In: k-core
    # decomposition — iterative degree peeling, the cohesion/backbone
    # member of the graph family:
    "kcore_decomposition",
    # r9 in: the skew A/B trio (plain vs salted on the same keys plus
    # the standalone plain join) replaces salted_skew_join's slot:
    "skew_ab_salted",
    "skew_ab_plain",
    "plain_skew_join",
    # r11: snapshot_merge_upsert out on its green r2-r10 rows (8
    # consecutive) — the merge-upsert lifecycle stays driver-gated
    # in-window through snapshot_job_e2e (whose e2e row runs the same
    # key-dedup merge + idempotent sink + reconcile gate) plus the
    # sink/merge unit suites. In: ANN retrieval-quality EVALUATION
    # (recall@K / MRR / nDCG of the IVFADC system list vs the exact-
    # cosine truth list, all-integer ppm metrics) — the index-change
    # acceptance harness a production vector stack runs, previously
    # only pinned by tests:
    "ann_recall_eval",
    # r7 in: the five post-rotation late-r6 operators.
    # r11 (late): bigram_lm_perplexity out on its green r7-r10 rows (4
    # consecutive) — n-gram LM arithmetic keeps its prior rows +
    # tests/test_perplexity.py, and the incoming row computes the SAME
    # corpus unigram statistics (cf / total tokens) applied in the
    # retrieval direction. In: Dirichlet-smoothed query-likelihood
    # retrieval (Zhai & Lafferty), the LM counterpart that A/Bs against
    # bm25_topk_search on identical query/tokenizer/corpus:
    "lm_dirichlet_topk",
    # r11 (late): events_session_window_native out on its green r7-r10
    # rows (4 consecutive) — event-time windowed aggregation stays
    # in-window via streaming_hourly_rollup (watermarked windows under
    # a real stream) + events_gap_fill + events_dpp_prune, and
    # sessionization keeps its prior greens + the sessionize twin's
    # rows + unit suites. In: per-user EWMA smoothing over event order
    # (depth-16, dyadic-exact decay weights) — the exponential-decay
    # member of the rolling-feature family:
    "events_ewma_smoothing",
    # r11 (late): zorder_curve_rollup out on its green r7-r10 rows (4
    # consecutive) — layout management stays driver-gated via
    # events_dpp_prune (partition-pruned serving) and the compaction/
    # GC/soak machinery keeps its sf1 gates + unit suites. In:
    # degree-ordered triangle counting on the support-pruned
    # co-purchase graph — the community-density member of the graph
    # family beside pagerank (centrality) and components (reachability):
    "part_copurchase_triangles",
    # r11 (late): customer_hierarchy_recursive out on its green r7-r10
    # rows (4 consecutive) — iterative/recursive plan shapes stay
    # in-window via part_copurchase_pagerank + dedup_canonical_keep
    # (connected components) and the hierarchy keeps its prior rows +
    # tests. In: SQ8 scalar quantization (per-dimension min/max train,
    # uint8 encode, reconstruct-and-serve) — the codebook-free member
    # of the quantization family beside the in-window ivfpq rows:
    "sq8_quantized_topk",
    # r9 in: fixed-table BPE apply (full oracle) replaces the rows-only
    # trainer's slot:
    # r13: bpe_apply_fixed out on its green r9-r12 rows (4
    # consecutive) — BPE keeps its prior greens, the trainer's e2e +
    # property tests, and token-window machinery stays in-window via
    # doc_chunking. In: dedup candidate-generation eval — the dedup
    # twin of ann_recall_eval: exact-Jaccard truth vs MinHash-LSH
    # candidates with recall/precision in exact ppm, composing the two
    # verified contracts verbatim (the measurement banding is tuned
    # against):
    "dedup_recall_eval",
    # r7 in: both persisted serving paths (the inline twins' green rows
    # don't cover the on-disk index layout).
    # r10 (mid-round): both rotate out on green r7-r9 rows for their
    # r10-NEW tombstone-deletion twins — the same persisted build +
    # serving path (so the family keeps full coverage: the incoming rows
    # run build_*_index AND *_search end-to-end) PLUS the delete_docs /
    # delete_vectors lifecycle, oracled as corpus-minus-victims (the
    # rebuild-without-equality contract). bm25_topk_search (inline) and
    # ivfpq_persisted_rerank_topk (persisted rerank) stay in-window:
    "ivfpq_tombstone_topk",
    # r14 (late): bm25_tombstone_topk out on its green r10-r13 rows (4
    # consecutive) — the tombstone-deletion serving contract stays
    # driver-gated in-window through its vector twin
    # ivfpq_tombstone_topk (identical delete-then-serve semantics,
    # oracled as corpus-minus-victims on the other index family; the
    # same twin-coverage note this round's bm25_filtered_topk rotation
    # used), and the BM25 index path keeps passage_bm25_doc_topk /
    # rm3_query_expansion_topk / phrase_proximity_topk in-window. In:
    # the log-rank (Mantel-Cox) two-sample survival test — the
    # hypothesis-test companion to kaplan_meier_repurchase (KM
    # estimates the curve; this tests whether two strata's curves
    # differ, censoring in the estimand):
    "logrank_repurchase_test",
    # r7 in (q16 retained r9 as the anti-join shape holder); r9 in:
    # the four scalar-suite TPC-H members, individually verified
    # r12: q16_supplier_relation_count out on its green r7-r11 rows (5
    # consecutive). The anti-join shape it held stays in-window through
    # the tombstone serving rows (bm25/ivfpq broadcast anti-joins every
    # round) and its own 5-round green history; TPC-H breadth keeps
    # q6/q14/q17/q19 below. In: per-group OLS trend fit — closed-form
    # normal equations over exact BIGINT sufficient statistics, the
    # regression primitive beyond corr/covar:
    "ols_trend_by_nation",
    # r13: q6_forecast_revenue out on its green r9-r12 rows (4
    # consecutive) — the plain filter-agg shape stays in-window via
    # q14 (case-sum-ratio over the same fact filter), q17/q19 keep
    # TPC-H breadth, and q6 keeps its prior greens + the scalar-suite
    # history. In: Jelinek-Mercer interpolated BIGRAM query-likelihood
    # retrieval — the sequence-aware LM ranking member beside
    # lm_dirichlet's unigram row (same corpus/tokenizer, A/Bs
    # unigram-Dirichlet vs bigram-JM on identical inputs), positional
    # bigram counts via map-side HOFs with no explode and no per-term
    # shuffle:
    "jm_bigram_lm_topk",
    # r14: q14_promo_revenue_ratio out on its green r9-r13 rows (5
    # consecutive) — TPC-H breadth keeps q19 in-window (disjunctive
    # filter-agg, the same family's harder shape) plus q14's own prior
    # greens and the scalar-suite history. In: second-order (trigram)
    # Markov transitions with the marginalized first-order estimate in
    # every row (memory_ppm = p2 - p1) — the sequence-model A/B member
    # beside event_transition_matrix (in-window), the way
    # jm_bigram_lm_topk A/Bs lm_dirichlet:
    "event_trigram_transitions",
    # r13: q17_small_quantity_revenue out on its green r9-r12 rows (4
    # consecutive) — its join + correlated grouped-avg filter shape
    # stays in-window via q19's disjunctive join filters and the big
    # TPC-H rows' prior+parity record; q14/q19 keep TPC-H breadth. In:
    # link prediction over the co-purchase graph (Adamic-Adar +
    # Resource-Allocation from one wedge pass) — the graph family's
    # ABSENT-edge ranking member beside pagerank (nodes), triangles /
    # LPA (present structure); reuses the _und_edges signal graph, so
    # the window now drives the full und-chain: triangles, kcore, LPA,
    # link prediction:
    "copurchase_link_prediction",
    "q19_disjunctive_revenue",
    # r7 in: showcase / shape rows; r9 in: json_struct_extract,
    # parts_catalog_profile, price_histogram, deterministic_sample.
    # r9 (mid-round): pivot_status_by_year out on its green r7+r8 rows
    # (events_grouping_sets keeps the reshaping family) to admit the
    # r9-NEW substring-level dedup — new ops earn their driver row in
    # their own round:
    # r13: dup_ngram_spans out on its green r9-r12 rows (4
    # consecutive) — substring-level dedup keeps its prior greens +
    # property tests, and the shingle/posting near-dup family stays
    # in-window via incremental_dedup_lsh, sparse_cosine_pairs,
    # dedup_canonical_keep and the incoming row. In: shingle
    # containment C(A->B) = |A∩B|/|A| — the ASYMMETRIC near-dup
    # (doc-contained-in-doc, boilerplate-wrapped duplicates) that
    # Jaccard's symmetric denominator dilutes below every LSH
    # threshold; sparse-cosine df clamp bounds the posting join:
    "shingle_containment_pairs",
    # r13: json_struct_extract out on its green r9-r12 rows (4
    # consecutive) — JSON-shape coverage keeps its prior greens plus
    # json_events_agg's record, and nested-extraction expressions ride
    # doc_chunking/corpus_curation HOFs in-window. In: first-order
    # Markov transition matrix over per-user event sequences — the
    # sequence-model member beside the funnel (fixed path) and
    # sessionizer (gap grouping): one per-user ordered window, then
    # exact-ppm conditional probabilities on the KB-sized type matrix:
    "event_transition_matrix",
    # r13: parts_catalog_profile out on its green r9-r12 rows (4
    # consecutive) — distribution-stats coverage stays in-window via
    # grouped_mad_outliers (exact median/MAD histogram-window) and
    # cms_heavy_hitters; the profile row keeps its prior greens. In:
    # per-nation CUSUM level-shift detection — the SEQUENTIAL drift
    # member beside the MAD point fence (Page 1954), scaled integer
    # CUSUM n*P_t - t*S so the whole row (values AND ppm threshold) is
    # exact DECIMAL/BIGINT arithmetic with one window exchange:
    "cusum_changepoint",
    # r13: price_histogram out on its green r9-r12 rows (4
    # consecutive) — distribution-stats coverage stays in-window via
    # parts_catalog_profile + the scalar-suite members, and the
    # histogram shape keeps its prior greens. In: per-nation MAD
    # outlier fence — the robust-statistics complement of corr/covar/
    # OLS (breakdown point 50%), with EXACT integer medians computed
    # from value histograms + cumulative windows so no per-group row
    # sort exists at any scale:
    "grouped_mad_outliers",
    # r13: deterministic_sample out on its green r9-r12 rows (4
    # consecutive) — reproducible sampling stays in-window via
    # weighted_sample_topk (A-ES md5-clock sampling, the exact-count
    # twin) plus its own prior greens and the hash-threshold unit
    # tests. In: IVF-bucketed binary quantization — the persisted
    # serving form of bq_hamming_topk (sign codes hive-partitioned by
    # IVF cell, probed-cell PartitionFilters, XOR/popcount shortlist
    # within probed cells only, exact rerank from the base table) —
    # the missing rung between SQ8 (flat scan) and IVFADC (probed ADC):
    "ivf_bq_hamming_topk",
    # r11: events_grouping_sets out on its green r7-r10 rows (4
    # consecutive) — multi-level rollup stays covered by its own prior
    # rows + events_cube's greens, and the events family keeps
    # events_session_window_native / events_gap_fill / events_dpp_prune
    # in-window. In: MMR diversified re-ranking (greedy
    # relevance-vs-redundancy list construction over the cosine top-N,
    # unrolled bounded-by-k) — the diversity serving pass:
    "mmr_diversified_topk",
    # reference lifecycle (sources -> sinks -> streaming -> full job).
    # streaming_snapshot_drain / idempotent_sink_roundtrip rotated out in
    # r3b (both hold green r2 driver rows, and snapshot_job_e2e's row
    # exercises the same checkpoint + idempotent-sink lifecycle) to admit
    # the watermark-semantics streaming row and the chunk/pack suite.
    # late-r6: snapshot_reconciliation / checkpoint_progress out on green
    # r2-r5 rows (snapshot_job_e2e's row gates the same reconcile +
    # checkpoint lifecycle end-to-end) to admit two of the four late-r6
    # operators below.
    # r12: streaming_hourly_rollup out on its green r3b-r11 rows (8
    # consecutive). Streaming stays driver-gated in-window via
    # streaming_click_attribution_outer (watermark-expiry semantics
    # under a real stream, the harder contract) and keeps its prior
    # rows + the streaming unit suites; windowed event-time aggregation
    # also rides events_ewma_smoothing's ordered windows. In: label
    # propagation communities — deterministic synchronous LPA, the
    # community member of the graph family between components
    # (reachability) and triangles (local closure):
    "label_propagation_communities",
    # r9: chunk_pack_suite out on its green r3b-r8 rows; its two
    # component operators take the slots individually.
    # r14: doc_chunking out on its green r9-r13 rows (5 consecutive) —
    # the token-window machinery stays DRIVER-GATED in-window via
    # passage_bm25_doc_topk (whose plan composes doc_chunking's
    # windows as its chunking stage, every round), and the chunk/pack
    # family keeps doc_chunking's 5 greens + sequence_packing's prior
    # greens + the property suites. In: grouped isotonic regression
    # via the exact minimax/PAVA form — the shape-constrained member
    # completing the regression family beside ols_trend_by_nation and
    # theil_sen_by_nation (both in-window):
    "isotonic_trend_by_nation",
    # r13: sequence_packing out on its green r9-r12 rows (4
    # consecutive) — the chunk/pack family stays in-window via
    # doc_chunking (the same token-window machinery; packing keeps its
    # prior greens + property tests). In: per-nation Theil-Sen robust
    # trend — the regression family's ROBUST member beside
    # ols_trend_by_nation's least squares (median of pairwise slopes,
    # ~29% breakdown), all exact integer arithmetic: floor-quantized
    # rational slopes via the shared pmod identity + discrete medians:
    "theil_sen_by_nation",
    # r12: pyds_pushdown_scan out on its green r7-r11 rows (5
    # consecutive). Source-pushdown coverage stays via the plan-pinned
    # PushedFilters/ReadSchema contracts (tests/test_plan_shapes.py +
    # the 162-entry plan baseline) and every window row's parquet scans;
    # the Python DataSource API keeps tests/test_pydatasource.py. In:
    # multi-source BFS shortest hops — frontier expansion with exact
    # integer distances, the reachability-with-distance primitive:
    "bfs_shortest_hops",
    "snapshot_job_e2e",
    # r5 rotation: snapshot_cdc_diff out on its green r4 row (lifecycle
    # family keeps snapshot_job_e2e + snapshot_merge_upsert rows); admits
    # the stream-stream join. r6: the inner form rotates out on its green
    # r5 row in favor of the LEFT-OUTER form (VERDICT r5 ask #6) — the
    # harder semantics (watermark-expiry emission of unmatched views)
    # whose oracle embeds the inner join as its `pairs` CTE, so pair
    # coverage is kept.
    "streaming_click_attribution_outer",
    # training-mix curation family: orders_with_items_semi /
    # missing_ids_enriched out r2, temperature_mix_sample out r6 — all on
    # green driver rows; corpus_curation keeps the family's slot.
    # LLM-pipeline operators (suites carry six + two components each;
    # bpe_token_count / winnowing_fingerprints / ngram_jaccard_dedup
    # rotated out in r3 — all hold green r2 driver rows — to admit the
    # cluster-resolution, decontamination, and end-to-end curation ops)
    # r11: corpus_curation out on its green r3-r10 rows (8 consecutive)
    # — the curation family keeps doc_signal_suite (every per-doc
    # signal, in-window), weighted_sample_topk (budgeted selection) and
    # the incoming dedup_canonical_keep (the keep/drop decision); the
    # end-to-end curation pipeline keeps its prior rows + tests. In:
    # RM3 pseudo-relevance-feedback retrieval (BM25 pass-1 feedback ->
    # weighted term expansion -> pass-2 re-score), the recall-expanding
    # second pass a retrieval stack layers on BM25:
    "rm3_query_expansion_topk",
    # r12 (late): doc_signal_suite out on its green r3-r11 rows (9
    # consecutive — the window's longest remaining holder after the r12
    # rotations). Per-doc signal coverage stays via those nine driver
    # rows, the component unit suites (tests/test_extension_ops.py,
    # tests/test_properties.py), its own plan-baseline pin (strict
    # dict-equality keeps the 9-scan suite shape a failing gate), and
    # the in-window rows that consume the same tokenizer machinery
    # (doc_chunking / sequence_packing / weighted_sample_topk). In:
    # personalized PageRank (random-walk-with-restart) — the
    # query-dependent affinity member completing the graph family
    # (centrality=pagerank, reachability=bfs, cohesion=kcore,
    # community=lpa, closure=triangles), seeded teleport over the same
    # co-purchase graph:
    "part_copurchase_ppr",
    # r12: multimodal_suite out on its green r3-r11 rows (9
    # consecutive). The Arrow-batched binary-decode family stays
    # driver-gated via audio_meta_decode (in-window, the same
    # mapInPandas decode contract over RIFF containers) plus the image
    # suite's prior rows + tests/test_extension_ops.py; the plan-audit
    # python_eval allowlist still pins all three multimodal plans. In:
    # Matryoshka truncation acceptance eval — prefix-dim recall/top1
    # vs the full-dim exact ranking, all-integer metrics (the
    # dimension-vs-quality harness beside ann_recall_eval):
    "matryoshka_ann_eval",
    # r11: dedup_clusters out on its green r3-r10 rows (8 consecutive)
    # for the incoming dedup_canonical_keep, which embeds the IDENTICAL
    # LSH-candidates -> connected-components resolution as its first
    # stages (strictly finer coverage) and adds the quality-aware
    # per-cluster canonical pick (keep/drop output):
    "dedup_canonical_keep",
    # r11: contamination_check out on its green r3-r10 rows (8
    # consecutive) — set-overlap membership stays in-window via
    # incremental_dedup_lsh + ngram_jaccard_pruned + dup_ngram_spans
    # (shingle membership shapes) and its own prior rows + tests. In:
    # exact all-pairs sparse TF-IDF cosine with DISCO-style df prefix
    # pruning — the exact-similarity complement of the MinHash family:
    "sparse_cosine_pairs",
    # r7: embedding_near_dup out on its green r2-r6 rows to admit the
    # r7-new serving composition (ADC shortlist + exact re-rank) — new
    # ops earn their driver row in their own round:
    # r9 (mid-round): embedding_rerank_topk out on its green r7+r8 rows
    # for its r9-NEW persisted twin — the same oracle and semantics but
    # end-to-end through the on-disk index (shortlist from persisted
    # codes + corpus fetch), strictly more serving coverage.
    # r14: ivfpq_persisted_rerank_topk out on its green r9-r13 rows (5
    # consecutive) — the persisted-index serving path stays driver-
    # gated in-window via ivfpq_tombstone_topk and
    # ivfpq_filtered_rerank_topk (both run build + persisted serve
    # end-to-end each round) plus ivf_bq_hamming_topk's partitioned
    # store; the rerank contract keeps its prior greens + the
    # shortlist-equality tests. In: Mann-Whitney U rank-sum — the
    # nonparametric two-sample member beside chi_square_independence,
    # with exact tie-doubled U off the value histogram and a two-level
    # distributed prefix sum instead of a fact-sized global sort:
    "mann_whitney_u",
    # r9 in: the residual-ADC generalization took embedding_ivfpq_topk's
    # slot (its oracle replays the per-cell residual ADC in SQL).
    # r14: embedding_ivfpq_residual_topk out on its green r9-r13 rows
    # (5 consecutive) — the ADC path stays in-window via
    # ivfpq_persisted_rerank_topk, ivfpq_tombstone_topk and
    # ivfpq_filtered_rerank_topk (all exercise the same encode/ADC
    # contracts end-to-end), plus its own prior greens and the
    # all-cells == flat-PQ equality tests. In: the serving ladder's
    # missing METRIC rung — IVF maximum-inner-product retrieval over a
    # norm-weighted corpus (assignment, probing and ranking all by raw
    # inner product; IP-vs-cosine divergence test-pinned):
    "ivf_ip_topk",
    # r6 rotation (VERDICT r5 ask #2 — the ROADMAP backlog executed).
    # Out on green r5 rows: simhash_near_dup, fuzzy_name_dedup,
    # random_projection, dataset_split_assignment, kmeans_clusters
    # (k-means keeps coverage via the label_centroids row + the unrolled-
    # SQL parity suite and tests/test_kmeans.py), temperature_mix_sample,
    # q8_market_share (q2/q10 bring fresh join-heavy shapes in),
    # embedding_pq_topk (flat PQ is subsumed by the IVFADC composition
    # below — tests/test_ann_recall.py pins all-cells IVFADC == flat PQ).
    # In r6: the IVFADC composition (rotated out r9 for its residual
    # generalization above) plus never-driver-verified rows:
    # r10 (late): events_sliding_windows out on its green r6-r9 rows (4
    # consecutive) for the r10-NEW passage-retrieval row — windowed
    # event aggregation stays in-window via events_session_window_native
    # + events_gap_fill + streaming_hourly_rollup (windowed agg under a
    # real stream) + events_grouping_sets. In: chunk-level BM25 with
    # per-document max-pooling (the RAG / TREC-MaxP long-doc shape),
    # composing the doc_chunking windows with the shared BM25 spec:
    "passage_bm25_doc_topk",
    # r10 (late): moving_order_spend + funnel_conversion out on their
    # green r6-r9 rows (4 consecutive) for the r10-NEW filtered-serving
    # pair below — new ops earn their driver row in their own round.
    # Family coverage kept: rolling/range window frames stay in-window
    # via events_sliding_windows + events_gap_fill + running-window
    # shapes in the snapshot rows; event-funnel/session analytics stay
    # via events_session_window_native + events_sliding_windows (and the
    # full window_function_suite holds green prior rows out-of-window).
    # In: metadata-FILTERED retrieval over the persisted indexes —
    # candidates restricted, stats corpus-global (the serving-time
    # filter semantics, vs the tombstone rows' rebuild-without):
    # r14: bm25_filtered_topk out on its green r10-r13 rows (4
    # consecutive) — the metadata-FILTERED serving contract
    # (candidates restricted, stats corpus-global) stays driver-gated
    # in-window through its vector twin ivfpq_filtered_rerank_topk
    # (the identical filter semantics on the other index family), and
    # the BM25 index path keeps bm25_tombstone_topk,
    # bm25_sharded_merge_topk, passage_bm25_doc_topk and
    # rm3_query_expansion_topk in-window. In: Pearson chi-square
    # independence + Cramer's V — the categorical-association member
    # of the stats family (corr/covar numeric association, OLS/
    # Theil-Sen/isotonic trends, MAD/CUSUM outliers; this tests
    # dependence between categorical dimensions):
    "chi_square_independence",
    "ivfpq_filtered_rerank_topk",
    # r10 (late): corr_covar_stats out on its green r6-r9 rows (4
    # consecutive) for the r10-NEW shard-consolidation row — numeric-
    # aggregation family stays in-window via tpch_scalar_suite +
    # price_histogram (+ order_price_stats' green prior rows). In: the
    # merged-shards index served against the PLAIN corpus-wide BM25
    # oracle, driver-verifying that merge_indexes loses/double-counts
    # nothing vs a single-pass build:
    # r14 (late): bm25_sharded_merge_topk out on its green r10-r13
    # rows (4 consecutive) — the shard-consolidation contract stays
    # gated by the merge unit/e2e suites (incl. the r13/r14
    # legacy-layout fail-loud tests) and its plain-oracle serving
    # shape stays driver-gated in-window through bm25_tombstone_topk /
    # passage_bm25_doc_topk / rm3_query_expansion_topk /
    # phrase_proximity_topk (4 BM25-index rows remain). In:
    # Kaplan-Meier product-limit survival over customer repeat-
    # purchase gaps with right-censoring — the TIME-TO-EVENT member
    # of the stats family (tests/trends/outliers cannot express
    # censoring; retention/churn/time-to-failure primitive):
    "kaplan_meier_repurchase",
    # TPC-H core (scalar suite carries q6/q14/q17/q19; q4/q18/q22 out r5
    # on green r4 rows, q7/q9/q8 out r5/r6 on green rows — q2/q10/q12
    # bring the remaining unverified join-distribution shapes):
    # r6: scd2_order_history out on its green r5 row — the incremental
    # 3-generation fold below strictly generalizes it (its oracle applies
    # the same increment rule per generation; the init+1-increment ==
    # scd2_merge identity is pinned in tests/test_snapshot_diff.py):
    "scd2_incremental_history",
    # r10 (late): tpch_scalar_suite out on its green r3-r9 rows (7
    # consecutive — the longest-held slot in the window); every query
    # the suite carries (q6/q14/q17/q19) has held its OWN in-window
    # driver row since r9, so the family is covered by strictly finer
    # rows. In: fixed-BUDGET weighted sampling without replacement
    # (Efraimidis-Spirakis A-ES top-k, md5-derived exponential clocks)
    # — the exact-count weighted complement of the fixed-RATE
    # hash-threshold samplers:
    "weighted_sample_topk",
    # r10 (late): q2_min_cost_supplier out on its green r6-r9 rows (4
    # consecutive) — TPC-H family stays in-window via q16/q6/q14/q17/
    # q19 (the TakeOrdered shape also rides the bm25/sampling serving
    # rows). In: the AUDIO member of the multimodal decode family —
    # real RIFF/WAVE header build (JVM-side, little-endian) + Arrow-
    # batched chunk-walk parse, every field oracle-recomputed:
    "audio_meta_decode",
    # r10 (late): q10_returned_items out on its green r6-r9 rows (4
    # consecutive) — TPC-H join/top-k family stays in-window via q2
    # (min-cost join + TakeOrdered), q16 (join-agg-having), q17/q19/
    # q6/q14. In: count-min-sketch heavy hitters — bounded-memory
    # frequency estimation (the sketch complement to exact top_ngrams
    # and HLL approx_distinct), md5-derived hashes, one-sided error
    # pinned row by row against the exact counts:
    "cms_heavy_hitters",
    # late-r6: q13/q21 out on their green r5 rows (the r6 window keeps
    # q2/q10/q12 + the scalar suite for TPC-H shape diversity) to admit
    # the remaining late-r6 operators — new ops earn driver rows in
    # their own round.
    # r11 (late): events_gap_fill out on its green r7-r10 rows (4
    # consecutive) — LOCF/gap semantics keep its prior rows + unit
    # tests, the sequence/expansion shape stays in-window via
    # doc_chunking, and per-key ordered-window machinery via the
    # incoming events_ewma_smoothing. In: market-basket association
    # rules (support/confidence/lift, Apriori's rule stage) — the
    # frequent-itemset primitive beside the graph family's structural
    # views of the same co-purchase pairs:
    "copurchase_association_rules",
    # r10 (mid-round): bm25_topk_search out on its green r7-r9 rows for
    # the r10-NEW hybrid retrieval row — new ops earn their driver row
    # in their own round. Family coverage is strictly kept: the incoming
    # row's Spark plan CALLS bm25_topk_search as its lexical leg and its
    # oracle embeds the full BM25 oracle verbatim as the `lex` CTE (so
    # the exact BM25 scoring contract is still driver-gated every
    # round), and bm25_tombstone_topk keeps the persisted BM25 index
    # path in-window:
    # r14: hybrid_rrf_search out on its green r10-r13 rows (4
    # consecutive) — the exact BM25 scoring contract its oracle embeds
    # stays driver-gated in-window via bm25_tombstone_topk /
    # bm25_sharded_merge_topk / passage_bm25_doc_topk (and RM3's
    # two-pass row); RRF fusion keeps its prior greens + unit tests.
    # In: frequent session-path mining (top-20 five-event path
    # prefixes over the 30-min-gap sessionized stream) — the
    # sequential-pattern member beside the funnel (one fixed path),
    # the transition matrices (memoryless steps), and the sessionizer
    # (the grouping itself):
    "session_path_topk",
    # r12: events_dpp_prune out on its green r7-r11 rows (5
    # consecutive). The DPP contract stays a FAILING gate out-of-window:
    # its plan baseline entry pins dynamic_pruning=true (strict
    # dict-equality in tests/test_plan_snapshot.py) and
    # tests/test_plan_shapes.py pins the dynamicpruning subquery;
    # partition-pruned serving also rides the ivfpq probed-cell
    # PartitionFilters rows in-window. In: binary-quantized retrieval
    # (sign codes + XOR/popcount Hamming shortlist + exact rerank) —
    # the 64x-compression member of the quantization family beside
    # SQ8 and IVFADC:
    "bq_hamming_topk",
    "part_copurchase_pagerank",
]


def _ordered_names() -> list[str]:
    prioritized = [n for n in PRIORITY if n in CATALOG]
    rest = [n for n in CATALOG if n not in set(prioritized)]
    return prioritized + rest


def queries() -> dict[str, QueryFn]:
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracles() -> dict[str, str]:
    return {
        name: CATALOG[name].oracle
        for name in _ordered_names()
        if CATALOG[name].oracle is not None
    }
