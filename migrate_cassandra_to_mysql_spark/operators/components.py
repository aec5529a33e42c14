"""Distributed connected components — duplicate-cluster resolution.

LSH / MinHash candidate generation (operators/dedup.py) emits near-dup
PAIRS; an actual dedup pass needs CLUSTERS: if A~B and B~C, then {A, B, C}
is one duplicate group with one survivor, even when (A, C) never surfaced
as a candidate pair. That pair→cluster step is connected components over
the candidate graph.

Algorithm: minimum-label propagation. Every node starts labeled with its
own id; each round, every node adopts the smallest label among itself and
its neighbors; converged when no label changes. Each round is one
shuffle join (edges ⋈ labels on the edge source) plus one partial-agg
min-groupBy — both keyed on node id, so with AQE the two stages reuse one
partitioning. Rounds needed = graph diameter.

Scale rationale (100 TB):
  - Near-dup graphs are dense blobs (LSH buckets emit cliques), so the
    diameter — and the round count — is small (2-4 in practice); this is
    the regime where plain label propagation beats the O(log n)
    alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): star
    contraction pays edge-set rewrites per round to win on long-chain
    graphs that dedup workloads don't produce. For adversarial chains,
    `max_iter` bounds the work and the convergence flag reports
    non-convergence instead of silently looping.
  - Per round only (id, label) pairs shuffle — 16 bytes/node — never the
    documents themselves.
  - Each round's frame is EAGERLY localCheckpoint-ed: that materializes
    the round AND truncates the logical plan (plain persist leaves the
    full tree in place — `labels` is referenced twice per round, via the
    neighbor-min join and the convergence probe, so the analyzed plan
    would DOUBLE per iteration and Catalyst's own plan stringification
    OOMs the driver near max_iter on adversarial chain graphs; the same
    failure pagerank's dangling term exposed, pinned by the long-chain
    test). The convergence probe is a control-plane-sized action
    (isEmpty on a changed-labels frame), not a data collect.

The reference has no graph step (its dedup is key-level INSERT IGNORE,
snapshot_use_pyspark.py:456); this is engine-added surface for the
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .lineage import free_local_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in `edges`.

    `component` is the minimum node id reachable from `id` — a canonical,
    deterministic cluster representative (ideal as the dedup survivor
    key). Runs min-label propagation until a fixpoint or `max_iter`
    rounds; raises if the graph failed to converge (never observed on
    dedup graphs; reachable only via max_iter set below the diameter).
    """
    # Eagerly checkpoint the edge input BEFORE symmetrizing: the union
    # references `edges` twice (forward + reversed), so an expensive
    # caller pipeline — dedup_clusters feeds the full LSH candidate
    # chain here — would execute TWICE inside sym's materialization
    # (measured: dedup_canonical_keep warm 6.4 -> 5.0s, cold 12.4 ->
    # 4.9s at sf0.1 with the chain materialized once). Same discipline
    # as kcore/label_propagation's deliberate input checkpoint; the
    # blocks are freed with sym in `finally`.
    ek = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    sym = (
        ek.union(ek.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    # The frame whose executor blocks the NEXT round may free — always
    # the underlying checkpointed frame (a projection wrapper on top of
    # it would not resolve to the LogicalRDD free_local_checkpoint
    # needs).
    labels_ckpt = labels
    try:
        for _ in range(max_iter):
            # Each node's new label: min over its own and neighbors'.
            neighbor_min = (
                sym.join(labels, sym["d"] == labels["id"])
                .groupBy(F.col("s").alias("id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            # One job per round (r15): the new-label row can tell
            # INLINE whether it changed (the old component is right
            # there in the join), so the round's materialization and
            # the convergence probe fuse — a lazy localCheckpoint mark
            # whose first action is a full-frame SUM of the change
            # flags (an aggregate computes every partition, so the
            # checkpoint is fully materialized by it; limit-style
            # probes must NOT be used here — a partial scan would
            # truncate lineage with partitions never computed). The
            # previous shape ran an eager checkpoint job PLUS a
            # new⋈old probe join per round. Lineage truncation is
            # unchanged (see module docstring).
            new_labels = labels.join(neighbor_min, "id", "left").select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
                (
                    F.least("component", F.coalesce("nbr_min", "component"))
                    < F.col("component")
                )
                .cast("int")
                .alias("chg"),
            ).localCheckpoint(eager=False)
            n_changed = new_labels.agg(F.sum("chg")).collect()[0][0] or 0
            # The aggregate was the materializing action — the previous
            # round's checkpoint blocks are now dead weight; free them
            # to keep executor storage O(1) across rounds
            # (DataFrame.unpersist is a no-op on localCheckpoint
            # blocks; see operators/lineage).
            prev_ckpt = labels_ckpt
            labels_ckpt = new_labels
            labels = new_labels.select("id", "component")
            free_local_checkpoint(prev_ckpt)
            if n_changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()
        free_local_checkpoint(ek)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """(doc_id, component, is_survivor) for EVERY document.

    Documents with no candidate pair are singleton components of
    themselves. The survivor is the minimum doc_id in each component —
    deterministic, so an idempotent sink (sinks/idempotent.py) re-running
    the pass keeps the same rows.
    """
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp["id"], "left")
        .select(
            docs[id_col],
            F.coalesce("component", docs[id_col]).alias("component"),
            (F.coalesce("component", docs[id_col]) == docs[id_col]).alias(
                "is_survivor"
            ),
        )
    )


def canonical_keep(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_order: "list | None" = None,
) -> DataFrame:
    """Cluster-canonical selection — the curation DECISION a dedup pass
    feeds: within every duplicate cluster keep exactly one document, the
    best by a quality criterion, and emit per-doc keep/drop rows.
    `clusters` is dedup_clusters' output (id, component, is_survivor);
    `quality` carries id_col + the criterion columns; `quality_order`
    is the within-cluster preference (default: highest `quality`
    column, ties to the lowest id — a clone never beats its original).
    Returns (id_col, component, <quality cols...>, canonical_id, keep).

    Unlike dedup_clusters' min-id survivor (an arbitrary-but-
    deterministic pick), the canonical is quality-aware — "keep the
    longest/cleanest copy" — which is what production pipelines
    actually do before dropping near-dups.

    Scale shape: one equi-join on id (quality attaches to the cluster
    rows) and ONE hash exchange on component for the window; the
    canonical is first_value over the full frame, so no second join or
    self-aggregation re-shuffles the corpus. Clusters are tiny (near-
    dup groups), so the window's per-partition state is bounded."""
    from pyspark.sql import Window

    joined = clusters.join(quality, id_col)
    if quality_order is None:
        quality_order = [F.desc("quality"), F.asc(id_col)]
    w = (
        Window.partitionBy("component")
        .orderBy(*quality_order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        joined.withColumn("canonical_id", F.first(id_col).over(w))
        .withColumn("keep", F.col(id_col) == F.col("canonical_id"))
        .drop("is_survivor")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
    redistribute_dangling: bool = False,
    tol: float | None = None,
    outdeg_col: str | None = None,
) -> DataFrame:
    """(node, rank) after synchronous power iterations of PageRank over a
    directed edge list:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) [+ D/N])

    Two production options on top of the fixed-iteration oracle twin:
      - `redistribute_dangling=True`: mass held by dangling nodes (no
        out-edges) is spread uniformly (the D/N term above), so total
        rank mass is conserved at exactly 1.0 per iteration. The default
        False keeps the documented simple variant that the DuckDB oracle
        mirrors — on the symmetric co-purchase graphs the catalog feeds
        it, every node has out-edges, so the two variants coincide.
      - `tol`: when set, iteration stops early once the L1 delta
        sum(|rank' - rank|) drops below `tol`; `n_iter` becomes the cap.
        The delta is a 1-row aggregate action per round — it doubles as
        the in-loop materialization point, never a data collect.

    Determinism contract (shared with the DuckDB oracle): each
    contribution rank/outdeg is rounded to 12 dp and summed as
    DECIMAL(28,12) — exact and order-independent, so a 1000-executor run
    is bit-identical to a single-threaded one. The damping constants are
    combined with the same IEEE ops on both engines ((1.0 - d)/N, no
    transcendental functions), so ranks need no per-iteration tolerance.
    The dangling sum uses the same 12-dp DECIMAL discipline.

    Scale shape: the loop shuffles only (node, rank) pairs — 16 bytes per
    node per iteration — against a persisted (src, dst, outdeg) edge
    frame; each iteration's ranks are EAGERLY localCheckpoint-ed, which
    both materializes the round and truncates the logical plan, so
    lineage is O(1) deep in fact, not just intent (plain persist keeps
    the full logical tree — with the dangling term referencing ranks
    twice per round the plan doubles per iteration and Catalyst's plan
    stringification alone OOMs the driver; caught by the dangling
    tests). N rides as a broadcast 1-row aggregate, never a driver-side
    count action. localCheckpoint stores blocks on executors — a
    production run that must survive executor loss should set a reliable
    `spark.sparkContext.setCheckpointDir` deployment-side and swap in
    `checkpoint()`; semantics are identical.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # outdeg_col (r15, guide §2.4): an edge source that already carries
    # each src's out-degree on every row (the memoized co-purchase pair
    # parquet precomputes it once at build) skips the edge-sized
    # outdeg aggregation + join here — at sf0.1 that join planned as a
    # SortMergeJoin (two exchanges + two sorts of the edge set) on
    # every pagerank/ppr call. Values are identical by construction
    # (pinned by tests/test_pagerank.py); the default path is unchanged
    # for callers without a precomputed degree.
    if outdeg_col is not None:
        outdeg = edges.select(
            F.col(src).alias("src"),
            F.col(outdeg_col).cast("long").alias("n_out"),
        ).dropDuplicates(["src"])
        ed = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(outdeg_col).cast("long").alias("n_out"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        outdeg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("n_out")
        )
        ed = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Dangling set: nodes with no out-edges (left-anti vs outdeg keys).
    dangling = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    teleport = F.lit(1.0) - F.lit(damping)
    ranks = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(n_iter):
            contrib = ed.join(
                ranks, ed["src"] == ranks["node"]
            ).select(
                "dst",
                F.round(F.col("rank") / F.col("n_out"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
            sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            if redistribute_dangling:
                # 1-row broadcast scalar: total rank mass on dangling
                # nodes this round (same order-independent DECIMAL sum).
                d_mass = dangling.join(ranks, "node").agg(
                    F.coalesce(
                        F.sum(
                            F.round(F.col("rank"), 12).cast("decimal(28,12)")
                        ).cast("double"),
                        F.lit(0.0),
                    ).alias("d_mass")
                )
                extra = F.col("d_mass") / F.col("n_nodes")
            else:
                d_mass = None
                extra = F.lit(0.0)
            base = nodes.join(sums, nodes["node"] == sums["dst"], "left")
            if d_mass is not None:
                base = base.crossJoin(F.broadcast(d_mass))
            # Eager localCheckpoint = materialize this round AND truncate
            # the logical plan to a scan of the checkpointed blocks.
            new_ranks = (
                base.crossJoin(F.broadcast(n_df))
                .select(
                    "node",
                    (
                        teleport / F.col("n_nodes")
                        + F.lit(damping)
                        * (
                            F.coalesce(
                                F.col("s").cast("double"), F.lit(0.0)
                            )
                            + extra
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            if tol is not None:
                # L1 delta: one 1-row aggregate over two checkpointed
                # frames — the convergence probe, never a data collect.
                delta = (
                    new_ranks.alias("n")
                    .join(ranks.alias("o"), "node")
                    .agg(
                        F.sum(
                            F.abs(F.col("n.rank") - F.col("o.rank"))
                        ).alias("l1")
                    )
                    .collect()[0]["l1"]
                )
                prev = ranks
                ranks = new_ranks
                free_local_checkpoint(prev)
                if delta is not None and delta < tol:
                    break
            else:
                # new_ranks is already eagerly materialized, so the
                # previous round's checkpoint blocks are dead weight —
                # free them to keep executor storage O(1) per round.
                prev = ranks
                ranks = new_ranks
                free_local_checkpoint(prev)
        return ranks
    finally:
        ed.unpersist()
        nodes.unpersist()
        dangling.unpersist()


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
    broadcast_frontier: bool = False,
    broadcast_row_cap: int = 2_000_000,
    outdeg_col: str | None = None,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) after synchronous power iterations of PERSONALIZED
    PageRank (random-walk-with-restart) over a directed edge list:

        rank'(v) = (1-d) * t(v) + d * sum_{u->v} rank(u)/outdeg(u)

    where the teleport vector t restarts the walk at the SEED set
    instead of uniformly: t(v) = 1/|S| for v in `seeds` (a 1-column
    DataFrame of node ids), 0 elsewhere; rank_0 = t. The result is a
    seed-relative affinity score — the recommendation / related-items
    primitive (Page et al. 1999 §6 personalized vector; Tong et al.
    2006 RWR) beside global pagerank's query-independent centrality.
    A seed id absent from the edge list's node set is dropped (it still
    counts in |S|, so its 1/|S| restart mass leaves the system — the
    caller contract is seeds drawn from the graph).

    Determinism contract (identical to `pagerank`, shared with the
    DuckDB oracle twin): contributions round to 12 dp and sum as
    DECIMAL(28,12) — exact and order-independent, so a 1000-executor
    run is bit-identical to a single-threaded one; the teleport term is
    computed as the single quotient (1.0-d)/|S| on both engines (NOT
    (1-d)*(1/|S|), which differs in the last ulp at |S|=3,6,12,...).
    With seeds = ALL nodes the recursion is exactly global
    pagerank's (t = uniform), pinned by test.

    Scale shape (the `pagerank` discipline, plus the SPARSE loop
    state): the loop shuffles only frontier-sized (node, rank) pairs
    against a persisted (src, dst, outdeg) edge frame; |S| rides as a
    broadcast 1-row aggregate; the rank vector carries only nodes the
    walk has touched (the dense expansion happens once, at the end).
    `broadcast_frontier=True` additionally ships the frontier to every
    executor so the edge frame is never shuffled — guarded by
    `broadcast_row_cap` (falls back to the shuffle join once the walk
    has touched more rows than the cap, since a small-world k-hop
    neighborhood can approach the full node set); either join strategy
    yields bit-identical ranks (pinned by the A/B test).
    Each round's ranks are EAGERLY localCheckpoint-ed (materialize +
    truncate lineage, O(1) plan depth) with the previous round's
    blocks freed. Mass that
    walks into dangling nodes leaves the system (the simple variant
    the oracle mirrors; the catalog feeds symmetric co-purchase graphs
    where every node has out-edges, so no mass is lost there — pinned
    by the mass-conservation test).

    The reference has no graph step (snapshot_use_pyspark.py:216-224
    scans are row-parallel); engine-added training-pipeline surface.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # outdeg_col (r15): see pagerank — a precomputed per-row out-degree
    # skips the edge-sized outdeg aggregation + SortMergeJoin here.
    if outdeg_col is not None:
        ed = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(outdeg_col).cast("long").alias("n_out"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        outdeg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("n_out")
        )
        ed = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    # Checkpointed, not persisted: the RETURNED frame references the
    # node set (the final sparse-to-dense expansion), so an unpersist
    # in `finally` would force the caller's first action to recompute
    # the distinct; the checkpoint materializes it once and the
    # serving plan reads executor-local blocks. A caller that already
    # materialized the distinct node set (e.g. to pick seeds from it)
    # passes it via `nodes` (r15, guide §2.4) — the union-distinct is
    # an edge-wide shuffle, and paying it twice per call was the
    # single biggest seed-phase cost in the split probe.
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    # Seed sets are QUERY-SIZED by contract (docstring) — collect them
    # once (r15; the previous shape ran three control-plane jobs here:
    # an emptiness probe, a count aggregate, and a 3-row checkpoint)
    # and build the teleport frame as a pure-JVM local relation.
    seed_rows = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .collect()
    )
    # Loud contract check: an EMPTY seed set would otherwise yield
    # tp = 0 everywhere, an empty frontier every round, and an
    # all-zero rank vector that downstream top-k consumers would
    # treat as a valid answer.
    if not seed_rows:
        raise ValueError(
            "personalized_pagerank: empty seed set — the restart "
            "distribution is undefined (every rank would be 0.0)"
        )
    n_seeds = len(seed_rows)
    # Seed-only teleport frame (|S| rows): `tp` (the restart
    # probability, 1/|S| — the rank_0 init, the same single division
    # as pagerank's 1.0/n init) and `tp_upd` (the per-round teleport
    # TERM, (1-d)/|S| — again ONE division). Computing the term as
    # (1-d)*(1/|S|) instead is NOT IEEE-identical to pagerank's
    # (1-d)/n for every count (e.g. n=6: the product and the quotient
    # differ in the last ulp), which would break the all-seeds ==
    # global-pagerank bit-equality the tests pin. The DuckDB oracle
    # twin mirrors the same quotient — and Python's float division IS
    # the identical IEEE-754 double op the JVM ran here before (the
    # local_frame bit-exactness contract), pinned by
    # tests/test_pagerank.py's oracle/broadcast equality tests.
    #
    # The LOOP STATE is kept SPARSE (late r12): a node absent from the
    # rank frame holds rank exactly 0.0 by construction — (1-d)*0 +
    # d*round(0/n_out)-sums reduce to 0.0 — so carrying the full node
    # set through every round only materialized node-sized zero rows
    # five times over (measured: the node-sized tp-join + checkpoint
    # dominated the loop at 24M edges). Rounds now touch |frontier| +
    # |out-neighborhood| rows only; the full node set is expanded ONCE
    # at the end with an exact-0.0 coalesce, bit-identical output.
    from migrate_cassandra_to_mysql_spark.functions.localframe import (
        local_frame,
    )

    tp = 1.0 / n_seeds
    tp_upd = (1.0 - damping) / n_seeds
    seed_tp = local_frame(
        edges.sparkSession,
        [(int(r["node"]), tp, tp_upd) for r in seed_rows],
        "node long, tp double, tp_upd double",
    )
    st = seed_tp.select("node", "tp_upd")
    # rank_0 is a |S|-row LOCAL relation — flat lineage by construction,
    # no checkpoint job needed, and its row count is known exactly.
    ranks = seed_tp.select("node", F.col("tp").alias("rank"))
    ranks_n = n_seeds
    try:
        for _ in range(n_iter):
            # Frontier filter — the seeded walk's scale edge over the
            # global loop: rank is EXACTLY 0.0 until the walk reaches a
            # node ((1-d)*0.0 + d*0.0 stays 0.0; untouched DECIMAL sums
            # reduce to 0E-12 -> 0.0), and zero ranks contribute
            # round(0/n_out) = 0 to every sum, identical to absence. So
            # the contribution join is FRONTIER-sized — |S| nodes in
            # round 1, growing hop by hop — instead of node-sized, and
            # results are bit-identical (pinned by the reference tests,
            # which run nodes the walk never reaches).
            frontier = ranks.where(F.col("rank") != 0.0)
            # broadcast_frontier=True additionally ships the frontier
            # to every executor so the EDGE side is never shuffled or
            # sorted: each round is then one scan of the persisted edge
            # frame probing a hash map — the RWR serving shape at
            # scale, where "personalization changes the teleport
            # vector, not data movement" holds for the edge list too.
            # Opt-in because it is only safe under the seeded-locality
            # contract (the frontier is bounded by the seed-REACHABLE
            # component; all-seeds-style calls would broadcast a
            # node-sized frame). Join strategy cannot change values:
            # contributions are 12-dp DECIMAL sums, order-independent.
            #
            # Guard (r12 ADVICE): in small-world graphs the k-hop
            # neighborhood can approach the FULL node set, so the
            # "query-sized frontier" assumption is graph-dependent —
            # fall back to the shuffle join once the sparse rank
            # vector outgrows broadcast_row_cap. ranks_n was captured
            # when the frame was checkpointed — no per-iteration
            # count job.
            if broadcast_frontier and ranks_n <= broadcast_row_cap:
                frontier = F.broadcast(frontier)
            contrib = ed.join(
                frontier, ed["src"] == frontier["node"]
            ).select(
                "dst",
                F.round(F.col("rank") / F.col("n_out"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
            sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            # Sparse update: full-outer of the seed teleport terms and
            # the walked-mass sums — both frontier-scale. A node in
            # neither frame keeps exact 0.0 by absence (same IEEE
            # value the dense form computed for it: 0.0 + d*0.0).
            new_ranks = (
                st.join(sums, st["node"] == sums["dst"], "full")
                .select(
                    F.coalesce(st["node"], sums["dst"]).alias("node"),
                    (
                        F.coalesce(F.col("tp_upd"), F.lit(0.0))
                        + F.lit(damping)
                        * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if broadcast_frontier:
                # The row-cap guard needs this round's cardinality
                # anyway, so materialize the checkpoint THROUGH the
                # count (r15): eager=True runs an internal count job
                # and the explicit count() then ran a second job per
                # round — lazy mark + one count is the same
                # materialization in half the control-plane jobs.
                new_ranks = new_ranks.localCheckpoint(eager=False)
                ranks_n = new_ranks.count()
            else:
                new_ranks = new_ranks.localCheckpoint(eager=True)
                ranks_n = 0
            prev = ranks
            ranks = new_ranks
            free_local_checkpoint(prev)
        # Expand the sparse vector over the full node set ONCE: every
        # node the walk never reached holds exact 0.0 (the value the
        # dense loop computed for it each round). Seed ids absent from
        # the graph's node set drop out here, as before. Under the
        # seeded-locality contract the sparse vector is bounded, so
        # the expansion rides the same broadcast the loop uses —
        # keeping the serving plan exchange-free. The same row-cap
        # guard applies: a walk that saturated the graph falls back
        # to the shuffle join here too.
        final_ranks = (
            F.broadcast(ranks)
            if broadcast_frontier and ranks_n <= broadcast_row_cap
            else ranks
        )
        return nodes.join(final_ranks, "node", "left").select(
            "node", F.coalesce("rank", F.lit(0.0)).alias("rank")
        )
    finally:
        ed.unpersist()


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """(node, degree) for the k-core of an UNDIRECTED simple graph —
    the maximal subgraph where every node keeps degree >= k — after
    `rounds` synchronous peeling iterations (Matula-Beck peeling, the
    bulk-synchronous form every Pregel-style system uses): each round
    drops every node whose CURRENT degree is < k, then drops edges
    touching dropped nodes; fixed-point reached when a round removes
    nothing. `rounds` bounds the work (a differential twin unrolls the
    same count); the returned `degree` is recomputed on the final edge
    set. k-core is the density/cohesion primitive beside triangle
    counting (local clustering) and pagerank (global centrality) —
    the classic spam/anomaly and community-seed filter.

    `edges` holds one row per undirected edge with a < b (the
    support-pruned co-purchase convention).

    Scale shape: every round is ONE union-groupBy degree count plus one
    semi-join edge filter — all edge-sized, nothing node-quadratic; the
    edge frame is EAGERLY localCheckpoint-ed per round (the pagerank
    lineage discipline: each round's frame is referenced by degree
    count AND filter, so unpersisted lineage would double the plan per
    round), with the previous round's blocks freed. Peeling only ever
    SHRINKS the edge set, so per-round cost is monotonically
    non-increasing — the worst case is the first round on the full
    (already support-pruned) graph. A round that removes NO edge is
    the fixed point — peeling stops there (count() on the already-
    materialized checkpoint is a control-plane probe, not a data
    collect), so `rounds` is the BOUND and typical cost is the
    convergence depth (1/4/6 rounds at sf0.001/0.01/0.1, measured).
    Identical results to the full unroll: post-fixed-point rounds are
    no-op filters, which is exactly what the differential oracle's
    fixed `rounds` unroll computes."""
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    # Deliberate even when the caller already checkpointed its edge
    # frame (one redundant copy of a bounded, support-pruned edge list):
    # the peeling loop's round-0 lineage must be flat REGARDLESS of
    # caller discipline, and detecting "input is already a checkpoint
    # scan" would couple this operator to plan internals.
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n")
        # Lazy checkpoint mark + count as the materializing action (r15):
        # the fixpoint probe needs the round's cardinality anyway, and
        # eager=True ran its own internal count job first — one job per
        # round instead of two. count() is a full-frame aggregate, so
        # every partition is computed and the truncated lineage is safe.
        pruned = (
            e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_pruned = pruned.count()
        prev = e
        e = pruned
        free_local_checkpoint(prev)
        if n_pruned == n_edges:
            break
        n_edges = n_pruned
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, dist) = minimum hop count from any seed node, for every
    node reachable within `max_hops` over a DIRECTED edge list (pass
    both directions for an undirected graph) — synchronous frontier
    expansion (parallel BFS, the Pregel hello-world): each round
    extends every known distance by one hop and keeps the per-node
    minimum. Exact integer distances, so the result is deterministic
    under any partitioning. Unreached nodes are absent (no sentinel).

    `seeds` is a 1-column DataFrame of starting node ids (dist 0).

    Scale shape: per round one equi-join of the edge list against the
    CURRENT distance frame plus one min-groupBy — both keyed on node
    id; only (node, dist) pairs shuffle, never payloads. The distance
    frame is referenced twice per round (join + union), so each round
    is EAGERLY localCheckpoint-ed with the previous round's blocks
    freed (pagerank discipline). Rounds = max_hops, a fixed bound the
    oracle twin unrolls identically."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    dist = (
        seeds.toDF("node")
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        step = e.join(dist, e["src"] == dist["node"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.lit(1)).cast("long").alias("dist"),
        )
        new = (
            dist.unionAll(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        prev = dist
        dist = new
        free_local_checkpoint(prev)
    return dist


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, community) after `rounds` SYNCHRONOUS label-propagation
    iterations (Raghavan et al. 2007, the near-linear community
    detector) with a fully deterministic update: every node starts
    labeled with its own id; each round every node adopts the label
    carried by the MOST of its in-neighbors, ties broken toward the
    SMALLEST label (the tie rule that makes the sync variant
    reproducible — textbook async LPA visits nodes in random order,
    which no differential harness can pin). Pass both directions for
    an undirected graph. Nodes with no in-edges keep their label.

    Distinct from connected_components (pure reachability): LPA splits
    a connected blob into internally-dense groups — the community
    primitive between components (too coarse) and triangles (too
    local).

    Scale shape: per round ONE edge-keyed equi-join + one
    (node, label) count groupBy + one max_by reduction — all shuffles
    carry (node, label, count) triples only. The label frame is
    referenced twice per round (neighbor join + keep-own coalesce), so
    rounds are EAGERLY localCheckpoint-ed, previous blocks freed. The
    deterministic argmax is a single max_by(struct) partial-agg, never
    a window sort."""
    from pyspark.sql.types import NumericType

    for c in (src, dst):
        if not isinstance(edges.schema[c].dataType, NumericType):
            raise TypeError(
                f"label_propagation requires numeric node ids: column "
                f"{c!r} is {edges.schema[c].dataType.simpleString()}. The "
                "deterministic tie-break orders by the NEGATED label "
                "inside max_by — a non-numeric label would silently cast "
                "to NULL and break the smallest-label tie rule instead "
                "of failing loudly. Map string ids to dense numeric ids "
                "first (e.g. hash or zipWithIndex)."
            )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        counts = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n"), "lbl")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        # deterministic argmax: max count, ties to the smallest label —
        # one partial-aggregating max_by over an orderable struct (lbl
        # negated so "larger struct" = higher count then lower label).
        best = counts.groupBy("n").agg(
            F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias(
                "m"
            )
        ).select(F.col("n"), (-F.col("m.neg")).alias("new_lbl"))
        new_labels = (
            labels.join(best, labels["node"] == best["n"], "left")
            .select(
                "node",
                F.coalesce(F.col("new_lbl"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        prev = labels
        labels = new_labels
        free_local_checkpoint(prev)
    return labels.select("node", F.col("lbl").alias("community"))


def link_prediction_scores(
    und: DataFrame,
    deg_ceil: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Adamic-Adar + Resource-Allocation link-prediction scores for
    every NON-adjacent pair of an undirected simple graph (`und`: one
    row per edge, a < b): (u, v, n_common, adamic_adar, resource_alloc)
    with u < v, both indices summed over the pair's common neighbors w
    — AA weighting each w by 1/ln(deg w) (Adamic & Adar 2003), RA by
    1/deg w (Zhou, Lu & Zhang 2009). Unsorted; callers rank/limit.

    Wedge-center degree ceiling (r13 VERDICT ask #2 — the sparse-cosine
    df-clamp discipline): wedge enumeration fans out C(deg w, 2) pairs
    per center w, and unlike the triangle count degree orientation
    honestly CANNOT apply (both wedge arms are needed), so a single
    pathological hub would otherwise explode the self-join QUADRATICALLY
    in its degree no matter how small the rest of the graph is. The
    operator is therefore DEFINED over wedge centers with
    2 <= deg w <= deg_ceil: a center past the ceiling is excluded from
    BOTH indices (exactly as a term past the df clamp is excluded from
    the cosine), bounding any center's fan-out at C(deg_ceil, 2) and
    total wedge volume at |nodes| * deg_ceil^2 / 2 — a STRUCTURAL bound,
    not an empirical one. The pruned centers carry the least signal by
    the indices' own logic (1/ln d and 1/d are smallest exactly for
    mega-hubs — a shared bestseller is weak evidence); deg >= 2 stays
    for the ln(1) = 0 divergence (see the catalog row).

    Determinism: degrees are exact BIGINTs; each wedge term folds
    through round(·, 12) -> DECIMAL(28,12) so per-pair sums are
    order-independent under any partitioning; final scores round to
    8 dp. The catalog row's DuckDB oracle replays the identical capped
    wedge pass with the same deg_ceil literal."""
    ea, eb = F.col(a), F.col(b)
    nbr = und.select(ea.alias("n"), eb.alias("w")).unionAll(
        und.select(eb.alias("n"), ea.alias("w"))
    )
    deg = nbr.groupBy(F.col("n").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    wn = (
        nbr.join(F.broadcast(deg), nbr["w"] == deg["node"])
        .where((F.col("d") >= 2) & (F.col("d") <= F.lit(deg_ceil)))
        .select(
            "n",
            "w",
            F.expr(
                "CAST(round(1.0 / ln(CAST(d AS DOUBLE)), 12)"
                " AS DECIMAL(28,12))"
            ).alias("aa_w"),
            F.expr(
                "CAST(round(1.0 / CAST(d AS DOUBLE), 12)"
                " AS DECIMAL(28,12))"
            ).alias("ra_w"),
        )
    )
    x, y = wn.alias("x"), wn.alias("y")
    wedge = x.join(y, on="w").where(F.col("x.n") < F.col("y.n")).select(
        F.col("x.n").alias("u"),
        F.col("y.n").alias("v"),
        F.col("x.aa_w").alias("aa_w"),
        F.col("x.ra_w").alias("ra_w"),
    )
    cand = wedge.join(
        F.broadcast(und),
        (wedge["u"] == ea) & (wedge["v"] == eb),
        "left_anti",
    )
    return (
        cand.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("aa_w").alias("aa"),
            F.sum("ra_w").alias("ra"),
        )
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            "n_common",
            F.round(F.col("aa").cast("double"), 8).alias("adamic_adar"),
            F.round(F.col("ra").cast("double"), 8).alias("resource_alloc"),
        )
    )
