"""Dump .explain('formatted') for named catalog queries into files.

Optimization-round evidence tool (guide §1): capture the physical plan
of each touched query before and after a change.

Usage:
    PYTHONPATH=. python tools/dump_formatted_plans.py <suffix> <out_dir> \
        <query> [<query> ...]

Writes <out_dir>/<query>_<suffix>.txt per query (sf0.001 — plan shape,
not data volume, is what is being recorded; plan-time-executed builds
run at the same smoke scale the plan guard uses).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from migrate_cassandra_to_mysql_spark.plans import catalog
    from migrate_cassandra_to_mysql_spark.session import get_spark

    spark = get_spark("mc2m-plan-dump")
    qs = catalog.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
