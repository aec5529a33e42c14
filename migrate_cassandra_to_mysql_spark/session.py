"""SparkSession factory with scale-oriented defaults.

The reference configures Spark via env vars + spark-submit flags
(`config _example.sh:28-33`, 4 executors x 2 cores). Here the session is
built in code with AQE on so partition sizing adapts at runtime instead of
being fixed at 256 static ranges (`snapshot_use_pyspark.py:107-137`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mc2m-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults are chosen for the 100 TB design point, scaled down to the
    local[N] test harness:
      - AQE on (runtime partition coalescing, skew-join splitting) — replaces
        the reference's static 256-range oversubscription.
      - UTC session timezone so timestamp semantics match the DuckDB oracle.
      - Arrow enabled for the Pandas-UDF extension operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    # In local mode the driver JVM IS the executor: Spark's 1g default heap
    # has no headroom for the sf1 scale suite's localCheckpoint blocks
    # (observed fatal ConnectionReset at -Xmx1g). Only effective for the
    # process that creates the JVM — getOrCreate on a live session ignores it.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate re-runs computed generator inputs inside
        # its inferred size()>0 filter; every generate in this engine takes
        # a computed input (token/shingle arrays), so exclude it uniformly
        # at session build (sources/parquet.table re-pins it per load for
        # foreign sessions, keeping optimizer config order-independent).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
