"""Canonical bench-series runner (r12 VERDICT "what's wrong" #4).

BENCH_r{N}_local.json accumulated three record shapes across r12 —
flat run dicts without `value`, a nested {note, runs, anchored_cold}
block, and a {note, run} supplementary wrapping bench.py's raw line —
so cross-round tooling had to special-case all three. From r13 on,
every committed series uses ONE shape, produced here:

  {"note": <str>, "runs": [<flat record>, ...]}

where each flat record is the r12 `runs[0]` key set (the dominant
historical shape, so old tooling keeps working) derived mechanically
from bench.py's JSON line:

  calib_sec, calib_parallel_sec, cold_total_sec (= bench `value`),
  exec_total_sec, warm_total_sec, warm_exec_total_sec,
  anchored_cold_total_over_calib_par, ngram_warm_sec, skew_ab,
  skew_ratio, sf1_total_sec, sf1_scd2_sec, sf1_five_plan_sec,
  extra_queries

Usage:
  python tools/bench_series.py [n_runs] [note...]
    — optional settle-wait + one DISCARDED warm-up pass (the
      round_close discipline), then n_runs recorded passes; prints the
      canonical series object as ONE json document on stdout.
  SKIP_WARMUP=1   skips the settle-wait + warm-up (already-warm host).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def to_flat_record(line: dict) -> dict:
    """bench.py JSON line -> the canonical flat run record."""
    skew = line.get("skew_ab") or {}
    plain = skew.get("skew_ab_plain")
    salted = skew.get("skew_ab_salted")
    sf1 = line.get("sf1") or {}
    sf1_q = sf1.get("queries") or {}
    return {
        "calib_sec": line["calib_sec"],
        "calib_parallel_sec": line["calib_parallel_sec"],
        "cold_total_sec": line["value"],
        "exec_total_sec": line["exec_total_sec"],
        "warm_total_sec": line["warm_total_sec"],
        "warm_exec_total_sec": line["warm_exec_total_sec"],
        "anchored_cold_total_over_calib_par": round(
            line["value"] / line["calib_parallel_sec"], 1
        ),
        "ngram_warm_sec": (line.get("warm_queries") or {}).get(
            "ngram_jaccard_pruned"
        ),
        "skew_ab": skew,
        "skew_ratio": (
            round(plain / salted, 2) if plain and salted else None
        ),
        "sf1_total_sec": sf1.get("total_sec"),
        "sf1_scd2_sec": sf1_q.get("scd2_incremental_history"),
        "sf1_five_plan_sec": (
            round(
                sf1["total_sec"] - sf1_q["scd2_incremental_history"], 3
            )
            if sf1.get("total_sec")
            and sf1_q.get("scd2_incremental_history")
            else None
        ),
        "extra_queries": line.get("extra_queries") or {},
    }


def _settle_then_warmup() -> None:
    from bench import cpu_calibration_parallel

    prev = cpu_calibration_parallel()
    for _ in range(6):
        time.sleep(20)
        cur = cpu_calibration_parallel()
        print(
            f"calib_par samples: {prev:.3f} -> {cur:.3f}",
            file=sys.stderr,
            flush=True,
        )
        if abs(cur - prev) <= 0.15 * max(cur, prev):
            print("host settled", file=sys.stderr)
            break
        prev = cur
    else:
        print(
            "WARNING: calibration never settled; compare anchored "
            "ratios, not raw seconds",
            file=sys.stderr,
        )
    subprocess.run(
        [sys.executable, "bench.py"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=False,
    )


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    note = " ".join(sys.argv[2:]) or "round-close settled series"
    if os.environ.get("SKIP_WARMUP", "0") != "1":
        _settle_then_warmup()
    runs = []
    for i in range(n_runs):
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True,
            text=True,
            check=True,
        )
        line = json.loads(out.stdout.strip().splitlines()[-1])
        rec = to_flat_record(line)
        runs.append(rec)
        print(
            f"run {i + 1}/{n_runs}: cold {rec['cold_total_sec']:.1f} "
            f"anchored {rec['anchored_cold_total_over_calib_par']:.0f} "
            f"warm_exec {rec['warm_exec_total_sec']:.1f}",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"note": note, "runs": runs}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
