"""Lineage-truncation block management for iterative operators.

Eager `localCheckpoint` is the only plan-truncation primitive that works
for loops (persist leaves the full logical tree in place — see
operators/components.py module docstring), but its blocks live at the
RDD level, OUTSIDE the CacheManager: `DataFrame.unpersist()` is a no-op
on them (verified: storage info unchanged), so a loop that checkpoints
every round accumulates one round's worth of executor storage per
iteration until driver-side GC happens to collect the superseded JVM
Dataset. On a 100 TB run that is an unbounded storage leak with a
nondeterministic release valve.

`free_local_checkpoint` reaches through the checkpointed frame's
LogicalRDD to the underlying RDD and unpersists its blocks directly.
Only call it on a frame whose successors have already been EAGERLY
materialized — a localCheckpoint cannot recompute (lineage is gone), so
freeing blocks that something still needs would fail the downstream job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> bool:
    """Release the executor-storage blocks behind an eagerly
    localCheckpoint-ed DataFrame. Returns True if blocks were freed,
    False when the frame is not a checkpoint scan (wrong node type —
    callers pass frames they created, so this is defensive, not a mode).
    """
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.getClass().getSimpleName() != "LogicalRDD":
            return False
        analyzed.rdd().unpersist(False)
        return True
    except Exception:
        # Best-effort: a torn-down context / unexpected plan shape must
        # never fail the algorithm that already produced its answer.
        return False
