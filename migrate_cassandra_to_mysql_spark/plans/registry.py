"""Query catalog registry.

Every engine capability is registered here as a named query:
  - a Spark callable (spark, sf_dir) -> DataFrame, and
  - (when SQL-expressible) a DuckDB oracle SQL string over the pre-registered
    views region/nation/customer/supplier/part/orders/lineitem/events/
    documents/embeddings.

Cross-engine determinism rules applied throughout the catalog (see
tools/check_oracles.py which enforces them):
  1. Money/quantity aggregation goes through DECIMAL casts so sums are
     *exact* and identical in both engines; only the final value is cast to
     DOUBLE (identical bits from identical exact decimals).
  2. Integer sums are cast to BIGINT on both sides (DuckDB sum(BIGINT)
     widens to HUGEINT otherwise).
  3. Every ORDER BY ... LIMIT has a full deterministic tie-break.
  4. Hash bucketing uses md5 (the one hash function both engines share).
  5. Floating-point similarity scores are rounded (8 dp) before ranking.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        CATALOG[name] = CatalogEntry(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in CATALOG.items()}


def oracles() -> dict[str, str]:
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
