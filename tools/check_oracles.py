"""Self-check harness mimicking the driver's DuckDB-oracle comparison.

Runs every catalog query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares: row count, column names, and values
(columns sorted by name, rows sorted by all columns — order-insensitive,
like the driver's value-hash).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd


def load_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from migrate_cassandra_to_mysql_spark.sources.parquet import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    sort_cols = [c for c in df.columns if df[c].map(type).nunique() <= 1]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            exact = sum(
                1
                for x, y in zip(af, bf)
                if (x == y) or (math.isnan(x) and math.isnan(y))
            )
            if exact != len(af):
                worst = max(
                    abs(x - y)
                    for x, y in zip(af, bf)
                    if not (math.isnan(x) and math.isnan(y))
                )
                problems.append(
                    f"col {c}: {len(af) - exact}/{len(af)} float values not "
                    f"bit-equal (max abs diff {worst:.3e})"
                )
        else:
            mism = (av.astype(str) != bv.astype(str)).sum()
            if mism:
                idx = (av.astype(str) != bv.astype(str)).idxmax()
                problems.append(
                    f"col {c}: {mism} mismatches, first at row {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from migrate_cassandra_to_mysql_spark.plans import catalog

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION") == "1":
        # Driver simulation: a RAW SparkSession with none of our factory's
        # conf (no UTC pin, no excluded rules, default shuffle partitions)
        # — every query must still match its oracle, because the engine
        # sets what it needs at load time (sources/parquet.table), not at
        # session build time.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-plain")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from migrate_cassandra_to_mysql_spark.session import get_spark

        spark = get_spark(
            "oracle-check", master="local[8]", shuffle_partitions=8
        )
    con = load_duckdb(sf_dir)

    qs, os_ = catalog.queries(), catalog.oracles()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in os_:
            print(f"SKIP  {name}: no oracle ({len(sdf)} rows from spark)")
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({len(sdf)} vs {len(odf)} rows)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
    print(f"\n{len(failed)} failures" if failed else "\nall green")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
