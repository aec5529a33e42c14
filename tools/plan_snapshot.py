"""Catalog-wide physical-plan feature snapshot.

tests/test_plan_shapes.py pins ~15 hand-curated plan contracts; this
tool generalizes the guard to EVERY catalog query: it builds each plan
at the smoke scale and extracts the stable, scale-meaningful features —
shuffle count, join strategies, Python evaluation, top-k form — into
`plan_baseline.json`. tests/test_plan_snapshot.py then fails loudly
when any query's plan shape drifts (a broadcast silently becoming a
sort-merge join, a new exchange sneaking into a map-side path, a Python
eval appearing in a JVM path), turning "the plan I audited" into "the
plan that is pinned".

Regenerate deliberately after an intentional plan change:

    PYTHONPATH=/root/repo python tools/plan_snapshot.py

and commit the diff — the review of that diff IS the plan audit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plan_baseline.json",
)
SF_DIR = "/root/testdata/sf0.001"


def plan_features(plan: str) -> dict:
    """The stable feature vector of a physical plan string. Counts only
    operators whose presence/number is a scale contract; no paths, no
    ids, no statistics — those vary run to run."""
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "python_eval": ("BatchEvalPython" in plan)
        or ("ArrowEvalPython" in plan)
        or ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "generates": plan.count("Generate"),
        "window_group_limit": "WindowGroupLimit" in plan,
        # Runtime partition pruning is a load-bearing scale property of
        # date-partitioned fact scans (events_dpp_prune): a plan that
        # loses its dynamicpruning subquery reads every partition.
        "dynamic_pruning": "dynamicpruning" in plan,
        # Read amplification (VERDICT r11 #4): the executed source-scan
        # count is the feature that catches a re-referenced frame
        # inlining its upstream scan once per reference (rm3 read the
        # corpus 7x, scd2 9x — invisible to the exchange/join counts).
        # Eagerly-checkpointed plans legitimately pin near 0 here: their
        # single build-time scan ran inside the checkpoint job, and the
        # serving plan reads executor-local blocks.
        "file_scans": plan.count("FileScan"),
        # Same-table refinement of file_scans: a 6-scan plan can be an
        # honest 6-table TPC-H join (each table once) or the same table
        # re-read 6x — only the latter is the read-amplification class.
        # Grouping key is the scan's Location path list (the table name
        # for parquet files, the temp dir for partitioned fixtures);
        # only the MAX per-key count is pinned, so run-varying temp
        # paths cannot destabilize the baseline.
        "max_same_table_scans": _max_same_table_scans(plan),
        "reused_exchanges": plan.count("ReusedExchange"),
    }


def _max_same_table_scans(plan: str) -> int:
    import re
    from collections import Counter

    locs = re.findall(r"Location: \w+\([^)]*\)\[([^\]]*)\]", plan)
    if not locs:
        return 0
    keys = []
    for loc in locs:
        m = re.search(r"([\w=.-]+)\.parquet", loc)
        if m:
            keys.append(m.group(1))
            continue
        # Fallback (partitioned locations): the first path often ends
        # in a partition dir like 'date=2026-01-01', whose basename
        # collides across DIFFERENT tables sharing partition values
        # (r12 ADVICE). Strip trailing key=value segments so the key
        # is the table directory itself.
        path = loc.split(",")[0].rstrip("/")
        while "=" in path.rsplit("/", 1)[-1] and "/" in path:
            path = path.rsplit("/", 1)[0]
        keys.append(path.rsplit("/", 1)[-1])
    return max(Counter(keys).values())


def snapshot(spark, sf_dir: str = SF_DIR) -> dict:
    from migrate_cassandra_to_mysql_spark.plans import catalog

    # Plan strings are cache-sensitive: once another suite (e.g. the
    # oracle-parity run) has MATERIALIZED the persisted subtrees some
    # queries cache, InMemoryTableScan subtrees inflate the stringified
    # plan (ngram_jaccard_pruned: 6 -> 15 exchanges purely from
    # CacheManager state). Clear the cache so features always reflect
    # the fresh-session shapes the committed baseline pins.
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name, fn in catalog.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_features(plan)
    return out


def main() -> int:
    from migrate_cassandra_to_mysql_spark.session import get_spark

    spark = get_spark(
        "plan-snapshot", master="local[8]", shuffle_partitions=8
    )
    snap = snapshot(spark)
    with open(BASELINE, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {BASELINE} ({len(snap)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
