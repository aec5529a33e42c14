#!/usr/bin/env python
"""fsck for a versioned live-dir store (inverted/IVFPQ index dirs).

Usage:
    python tools/index_doctor.py INDEX_DIR [--repair] \
        [--grace SECONDS] [--lock-stale SECONDS]

Detects (and with --repair fixes) the debris an interrupted maintainer
can leave behind: stranded .new staging dirs, stale maintainer locks,
broken/missing live symlinks, legacy real dirs in a versioned store,
out-of-grace orphan version dirs, stale snapshot manifests, and pointer
temp files. Report mode is read-only; repair mode serializes behind each
part's maintainer lock and never moves a live pointer away from its
current target (see operators/layout.doctor_live_store).

Exit code: 0 clean, 1 findings reported (report mode) or left unrepaired.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from migrate_cassandra_to_mysql_spark.operators.layout import (  # noqa: E402
    doctor_live_store,
)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("index_dir")
    p.add_argument("--repair", action="store_true")
    p.add_argument("--grace", type=float, default=600.0)
    p.add_argument("--lock-stale", type=float, default=3600.0)
    a = p.parse_args()
    findings = doctor_live_store(
        a.index_dir,
        repair=a.repair,
        gc_grace_seconds=a.grace,
        lock_stale_seconds=a.lock_stale,
    )
    for f in findings:
        print(json.dumps(f))
    unrepaired = [f for f in findings if f["action"] == "reported"]
    if not findings:
        print("clean")
    return 1 if unrepaired else 0


if __name__ == "__main__":
    sys.exit(main())
