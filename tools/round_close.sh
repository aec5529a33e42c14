#!/usr/bin/env bash
# The round-close ritual, one command (see ROADMAP round-10 targets and
# .claude/skills/verify/SKILL.md). Round 8 shipped with a red plan guard
# because the ritual was skipped; this script makes "run it even in a
# short round, cutting scope instead of gates" a single invocation.
#
#   tools/round_close.sh            # all gates + 3-run bench series
#   SKIP_BENCH=1 tools/round_close.sh   # correctness gates only
#
# Bench discipline (VERDICT r10 #4): a bench run launched straight after
# the heavy differential gates reads high — r10's first post-gates run
# breached the anchored gate at 129.5 while the immediate rerun scored
# 82.9. The bench section therefore (1) waits until two consecutive
# parallel-calibration samples agree within 15% (host settled), then
# (2) runs ONE DISCARDED warm-up bench pass before the recorded 3-run
# series. Never chase a first-after-heavy-load sample as a regression.
#
# Exits non-zero on the FIRST failing gate.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

echo "== plan guard (baseline must already be regenerated + committed) =="
python -m pytest tests/test_plan_snapshot.py -q

echo "== plan scale-outlier audit (r11: caught 16x corpus re-reads) =="
python tools/plan_audit.py

echo "== full default test suite =="
python -m pytest tests/ -q

echo "== oracle gates: sf0.001 / sf0.01 (factory + plain) / sf0.1 =="
python tools/check_oracles.py /root/testdata/sf0.001
python tools/check_oracles.py /root/testdata/sf0.01
SPARK_GRAFT_PLAIN_SESSION=1 python tools/check_oracles.py /root/testdata/sf0.01
python tools/check_oracles.py /root/testdata/sf0.1

echo "== sf1 scale suite =="
python -m pytest -m scale -q

echo "== index doctor over the scale suite's leftover stores (VERDICT r10 #6) =="
python - <<'PY'
import glob, os, sys
sys.path.insert(0, os.getcwd())
from migrate_cassandra_to_mysql_spark.operators.layout import doctor_live_store

roots = set()
base = os.path.realpath("/tmp/pytest-of-root/pytest-current")
for pat in ("*", "*/*"):
    for d in glob.glob(f"{base}/{pat}"):
        if os.path.isdir(d) and (
            os.path.exists(os.path.join(d, "_snapshot.json"))
            or glob.glob(f"{d}/*.v[0-9]*")
        ):
            roots.add(os.path.realpath(d))
# Repair mode (late r12): the sweep can run many minutes after a soak
# test's last pointer flip, so out-of-grace orphan versions — the GC
# debt the doctor exists to collect, in throwaway pytest stores nothing
# reads anymore — are EXPECTED under a contended gate run (the first
# report-only sweep failed the ritual on exactly this). Repair what the
# doctor is designed to repair; fail the ritual only on what it had to
# leave in place (action == "reported": active locks, unrepairable
# structural damage) — the doctor CLI's own exit contract.
bad = 0
for r in sorted(roots):
    for f in doctor_live_store(r, repair=True):
        tag = "REPAIRED" if f["action"] == "repaired" else "FINDING"
        print(f"{tag} {r}: {f}")
        if f["action"] != "repaired":
            bad += 1
print(f"index_doctor: {len(roots)} stores checked, {bad} unrepaired")
sys.exit(1 if bad else 0)
PY

if [ "${SKIP_BENCH:-0}" != "1" ]; then
  echo "== canonical 3-run bench series (tools/bench_series.py:" \
       "settle-wait + one DISCARDED warm-up, then 3 recorded runs in" \
       "the r13 canonical record shape) =="
  python tools/bench_series.py 3 "round-close settled series" \
    | tee /tmp/round_close_bench_series.json >/dev/null
  python - <<'PY'
import json
d = json.load(open('/tmp/round_close_bench_series.json'))
for r in d['runs']:
    print(
        f"calib_par {r['calib_parallel_sec']:.3f}  "
        f"cold {r['cold_total_sec']:.1f}  "
        f"exec {r['exec_total_sec']:.1f}  warm {r['warm_total_sec']:.1f}  "
        f"warm_exec {r['warm_exec_total_sec']:.1f}  "
        f"anchored {r['anchored_cold_total_over_calib_par']:.0f}"
    )
PY
  echo "(append /tmp/round_close_bench_series.json to" \
       "BENCH_r{N}_local.json's series list verbatim)"
fi

echo "ALL GATES GREEN"
