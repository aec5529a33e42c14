"""Split-timer probe for the PPR sf5 chain (VERDICT r12 next-round #4).

The r12 chain measured 32.8s -> 204.7s at 5x edges (6.2x — inside the
declared 1.6-slack linearity bound but flagged as "the number to
watch"), with the superlinearity ATTRIBUTED to the edge build's
pair-dedup sort (n log n) but not yet split-timer-proven after the
sparse-loop rework. This probe pins the attribution by timing the two
phases separately on the same disjoint-replica lineitem fixture the
scale suite uses:

  edge_build_sec  — _directed_copurchase_pairs: the per-order basket
                    aggregation + map-side pair explode + repartition
                    + dropDuplicates + eager checkpoint (the r14
                    bucketed pre-aggregation form; everything that
                    executes at frame-construction time), then a
                    count() to pin the edge cardinality;
  seeds_sec       — the 3-seed pick off the checkpointed pairs via
                    scaleplans._smallest_nodes (the catalog row's exact
                    shuffle-free form; the r13 fix replaced the
                    union-distinct + TakeOrdered that measured 55s at
                    sf5);
  loop_sec        — personalized_pagerank(..., broadcast_frontier=True)
                    over the ALREADY-BUILT edge frame + a noop write
                    of the dense expansion (the loop's eager
                    checkpoints execute inside the call).

Prints ONE JSON line: {"sf1": {...}, "sf5": {...}, "ratios": {...}}.
Record the result in BENCH_r{N}_local.json under "ppr_split".
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_COPIES = {"sf1": 10, "sf5": 50}


def main() -> int:
    import shutil

    from migrate_cassandra_to_mysql_spark.operators.components import (
        personalized_pagerank,
    )
    from migrate_cassandra_to_mysql_spark.plans.scaleplans import (
        _directed_copurchase_pairs,
    )
    from migrate_cassandra_to_mysql_spark.scale_data import synthesize_sf1
    from migrate_cassandra_to_mysql_spark.session import get_spark

    # Same session shape as the sf5 scale suite (tests/conftest.py):
    # local[8] + 8 shuffle partitions. The default local[32] session
    # OOMs an 8g heap in the sf5 pair dedup — 32 concurrent tasks'
    # aggregation maps where the suite runs 8 — and the point of the
    # probe is to split-time the EXACT chain the suite measures.
    spark = get_spark("ppr-split-probe", master="local[8]", shuffle_partitions=8)
    out: dict = {}
    dirs: list[str] = []
    try:
        for label, copies in _COPIES.items():
            d = tempfile.mkdtemp(prefix=f"mc2m_pprsplit_{label}_")
            dirs.append(d)
            synthesize_sf1(
                spark, _SRC_SF, d, copies=copies, tables=("lineitem",)
            )
            t0 = time.perf_counter()
            sub: dict = {}
            pairs = _directed_copurchase_pairs(spark, d, timings=sub)
            n_edges = pairs.count()
            t1 = time.perf_counter()
            # r15 catalog chain: one checkpointed distinct node set
            # feeds the seed pick AND the operator's final expansion;
            # the pairs parquet carries the precomputed out-degree.
            # (_smallest_nodes remains the min-agg reference form,
            # pinned equal by tests/test_pagerank.py.)
            from pyspark.sql import functions as F

            nodes = (
                pairs.select(F.col("src").alias("node"))
                .union(pairs.select(F.col("dst").alias("node")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            seeds = nodes.orderBy("node").limit(3).select("node")
            t2 = time.perf_counter()
            ranks = personalized_pagerank(
                pairs, seeds, n_iter=5, damping=0.85,
                broadcast_frontier=True, outdeg_col="n_out",
                nodes=nodes,
            )
            ranks.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            out[label] = {
                "n_edges": n_edges,
                "edge_build_sec": round(t1 - t0, 2),
                "basket_agg_sec": sub["basket_agg_sec"],
                "pair_dedup_sec": sub["pair_dedup_sec"],
                "seeds_sec": round(t2 - t1, 2),
                "loop_sec": round(t3 - t2, 2),
                "total_sec": round(t3 - t0, 2),
            }
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    r = {
        k: round(out["sf5"][k] / max(out["sf1"][k], 1e-9), 2)
        for k in (
            "n_edges", "edge_build_sec", "basket_agg_sec",
            "pair_dedup_sec", "seeds_sec", "loop_sec", "total_sec",
        )
    }
    print(json.dumps({"sf1": out["sf1"], "sf5": out["sf5"], "ratios": r}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
