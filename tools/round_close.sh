#!/usr/bin/env bash
# The round-close ritual, one command (see ROADMAP round-10 targets and
# .claude/skills/verify/SKILL.md). Round 8 shipped with a red plan guard
# because the ritual was skipped; this script makes "run it even in a
# short round, cutting scope instead of gates" a single invocation.
#
#   tools/round_close.sh            # all gates + 3-run bench series
#   SKIP_BENCH=1 tools/round_close.sh   # correctness gates only
#
# Exits non-zero on the FIRST failing gate.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

echo "== plan guard (baseline must already be regenerated + committed) =="
python -m pytest tests/test_plan_snapshot.py -q

echo "== full default test suite =="
python -m pytest tests/ -q

echo "== oracle gates: sf0.001 / sf0.01 (factory + plain) / sf0.1 =="
python tools/check_oracles.py /root/testdata/sf0.001
python tools/check_oracles.py /root/testdata/sf0.01
SPARK_GRAFT_PLAIN_SESSION=1 python tools/check_oracles.py /root/testdata/sf0.01
python tools/check_oracles.py /root/testdata/sf0.1

echo "== sf1 scale suite =="
python -m pytest -m scale -q

if [ "${SKIP_BENCH:-0}" != "1" ]; then
  echo "== 3-run bench series (append to /tmp/round_close_bench.jsonl) =="
  : > /tmp/round_close_bench.jsonl
  for i in 1 2 3; do
    python bench.py 2>/dev/null | tail -1 >> /tmp/round_close_bench.jsonl
  done
  python - <<'PY'
import json
for l in open('/tmp/round_close_bench.jsonl'):
    d = json.loads(l)
    print(
        f"calib_par {d['calib_parallel_sec']:.3f}  cold {d['value']:.1f}  "
        f"exec {d['exec_total_sec']:.1f}  warm {d['warm_total_sec']:.1f}  "
        f"warm_exec {d['warm_exec_total_sec']:.1f}  "
        f"anchored {d['value']/d['calib_parallel_sec']:.0f}"
    )
PY
  echo "(commit the series into BENCH_r{N}_local.json with per-run anchors)"
fi

echo "ALL GATES GREEN"
