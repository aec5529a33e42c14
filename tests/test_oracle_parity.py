"""Differential test: every catalog query vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + columns +
order-insensitive values), so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from migrate_cassandra_to_mysql_spark.plans import catalog
from tools.check_oracles import compare

ALL_QUERIES = sorted(catalog.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    fn = catalog.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracle = catalog.oracles().get(name)
    if oracle is None:
        # Rows-only check for non-SQL-expressible ops (driver does the same).
        assert len(sdf) >= 0
        return
    odf = oracle_con.execute(oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "file_id",
        "status",
        "priority",
        "modified",
        "total_price",
        "client_id",
        "token_bucket",
    ]


# Deliberate rows-only entries: iterative algorithms whose step k+1
# consumes step k's output, which single-statement SQL cannot express.
# Each must carry a pure-Python reference test instead (test_bpe.py).
ROWS_ONLY: set[str] = {"bpe_merge_training"}


def test_every_query_has_oracle_or_is_flagged():
    qs, os_ = catalog.queries(), catalog.oracles()
    missing = set(qs) - set(os_)
    # Keep the rows-only set deliberate and small.
    assert missing <= ROWS_ONLY, f"queries without oracle: {missing - ROWS_ONLY}"
