"""Assembled query catalog: importing this module registers every plan."""

from __future__ import annotations

import migrate_cassandra_to_mysql_spark.plans.relational  # noqa: F401
from migrate_cassandra_to_mysql_spark.plans.registry import (  # noqa: F401
    CATALOG,
    oracles,
    queries,
)

# Extension-operator plan modules are imported lazily-but-eagerly here so a
# syntax error in one module is loud at import time.
try:
    import migrate_cassandra_to_mysql_spark.plans.textplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.vectorplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.pipelineplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.statsplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.scaleplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.tpch_suite  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.funcplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
try:
    import migrate_cassandra_to_mysql_spark.plans.analyticsplans  # noqa: F401
except ImportError:  # pragma: no cover - module added in a later milestone
    pass
