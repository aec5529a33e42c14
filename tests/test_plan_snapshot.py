"""Catalog-wide plan-shape regression guard: every query's physical-plan
feature vector (shuffles, join strategies, Python evals, top-k form)
must match the committed plan_baseline.json. A drift means a plan
changed shape without a deliberate baseline regeneration — fail loudly
with the per-query feature diff. Regenerate after INTENTIONAL plan
changes with `PYTHONPATH=/root/repo python tools/plan_snapshot.py` and
review the diff (that review is the plan audit)."""

from __future__ import annotations

import json
import os


def test_all_plans_match_committed_baseline(spark):
    from tools.plan_snapshot import BASELINE, SF_DIR, snapshot

    assert os.path.isfile(BASELINE), (
        "plan_baseline.json missing — run tools/plan_snapshot.py"
    )
    with open(BASELINE) as f:
        baseline = json.load(f)
    current = snapshot(spark, SF_DIR)

    missing = sorted(set(baseline) - set(current))
    new = sorted(set(current) - set(baseline))
    assert not missing, f"queries vanished from catalog: {missing}"
    assert not new, (
        f"new catalog queries not in plan baseline (regenerate): {new}"
    )

    diffs = {}
    for name, feats in baseline.items():
        got = current[name]
        if got != feats:
            diffs[name] = {
                k: (feats[k], got[k])
                for k in feats
                if feats[k] != got.get(k)
            }
    assert not diffs, (
        "plan shapes drifted (baseline, current): "
        + json.dumps(diffs, indent=1, sort_keys=True)
    )


def test_max_same_table_scans_parser():
    """The same-table extractor groups scans by their Location path list
    and reports the worst single source — multi-table joins stay low,
    same-table re-reads count up, cache/checkpoint-only plans pin 0."""
    from tools.plan_snapshot import _max_same_table_scans

    multi_table = (
        "FileScan parquet [a] Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/orders.parquet], X\n"
        "FileScan parquet [b] Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/lineitem.parquet], X\n"
        "FileScan parquet [c] Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/nation.parquet], X\n"
    )
    assert _max_same_table_scans(multi_table) == 1

    same_table = multi_table + (
        "FileScan parquet [d] Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/orders.parquet], X\n"
        "FileScan parquet [e] Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/orders.parquet], X\n"
    )
    assert _max_same_table_scans(same_table) == 3

    # checkpointed plans have no FileScan at all
    assert _max_same_table_scans("WholeStageCodegen\n+- Project") == 0

    # partitioned fixture dirs without a .parquet basename group by the
    # location string itself (stable within one plan)
    part_dir = (
        "FileScan parquet [a] Location: InMemoryFileIndex(12 paths)"
        "[file:/tmp/x1/date=2026-01-01, ... 11 entries], X\n"
        "FileScan parquet [b] Location: InMemoryFileIndex(12 paths)"
        "[file:/tmp/x1/date=2026-01-01, ... 11 entries], X\n"
    )
    assert _max_same_table_scans(part_dir) == 2
