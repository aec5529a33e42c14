"""Scale-outlier audit over plan_baseline.json — the sweep that caught
sparse_cosine_pairs re-reading the corpus 16 times (r11).

Rules (each with an explicit allowlist of documented exceptions):
  - python_eval only on the Arrow-batched multimodal/audio rows;
  - broadcast nested-loop joins capped at 3 (1-row stat broadcasts are
    the legitimate use; more usually means a re-referenced frame is
    inlining its upstream per reference — fix with eager
    localCheckpoint, see the triangle/sparse-cosine commits);
  - total exchanges capped at 14 (sparse_cosine read 19 pre-fix; the
    densest honest plans — tpch_scalar_suite, window suites — sit
    around 10-13);
  - single-partition exchanges capped at 4 (scalar-stat suites
    legitimately run a few global aggregates).

Exit non-zero on any violation: wired into tools/round_close.sh so a
future plan regression fails the round-close ritual, not a judge pass.
"""

from __future__ import annotations

import json
import os
import sys

PYTHON_EVAL_ALLOWED = {
    "audio_meta_decode",
    "multimodal_decode",
    "multimodal_suite",
}
MAX_BNLJ = 3
MAX_EXCHANGES = 14
MAX_SINGLE_PARTITION = 4


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plan_baseline.json",
    )
    baseline = json.load(open(path))
    bad = 0
    for name, f in sorted(baseline.items()):
        if f.get("python_eval") and name not in PYTHON_EVAL_ALLOWED:
            print(f"FAIL {name}: python_eval in a non-multimodal row")
            bad += 1
        if f.get("broadcast_nested_loop_joins", 0) > MAX_BNLJ:
            print(
                f"FAIL {name}: {f['broadcast_nested_loop_joins']} BNLJs"
                f" > {MAX_BNLJ} — re-referenced frame inlining upstream?"
            )
            bad += 1
        if f.get("exchanges", 0) > MAX_EXCHANGES:
            print(
                f"FAIL {name}: {f['exchanges']} exchanges"
                f" > {MAX_EXCHANGES}"
            )
            bad += 1
        if f.get("single_partition_exchanges", 0) > MAX_SINGLE_PARTITION:
            print(
                f"FAIL {name}: {f['single_partition_exchanges']}"
                f" single-partition exchanges > {MAX_SINGLE_PARTITION}"
            )
            bad += 1
    print(f"plan_audit: {len(baseline)} plans checked, {bad} findings")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
