"""transformWithStateInPandas running totals (streaming/stateful.py):
the Spark 4 arbitrary-state API carrying per-user (count, sum, max)
across micro-batches.

Executing a transformWithState query needs the `protobuf` package
(Spark's Python state-server protocol); this sandbox has none and
installs are off-limits, so the end-to-end tests skip when the import
is unavailable. Plan construction and the processor's pure-pandas
accumulation logic are tested unconditionally — and the executed
custom-stateful coverage rides the applyInPandasWithState sessionizer
(tests/test_stateful_streaming.py).
"""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from migrate_cassandra_to_mysql_spark.sources.parquet import table as T
from migrate_cassandra_to_mysql_spark.streaming.stateful import (
    RUNNING_OUT_SCHEMA,
    running_totals_stream,
)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


needs_protobuf = pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState execution needs protobuf (absent in sandbox)",
)


def test_plan_constructs_with_declared_schema(spark, sf_dir):
    """Building the streaming plan (schema negotiation, groupBy wiring)
    needs no protobuf — only query START does."""
    work = tempfile.mkdtemp()
    events = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = f"{work}/src"
    events.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = running_totals_stream(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total",
        "max_value",
    ]


def test_processor_accumulation_logic():
    """The processor body is pure pandas over a fake state slot — the
    accumulation contract (count/sum/max across batches) is testable
    without a streaming runtime."""
    from migrate_cassandra_to_mysql_spark.streaming.stateful import (
        _lazy_processor_cls,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    proc = _lazy_processor_cls()()
    handle = FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame({"value": [1.0, 5.0, 2.0]})
    b2 = pd.DataFrame({"value": [10.0]})
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))[0]
    assert out1.iloc[0].tolist() == [7, 3, 8.0, 5.0]
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))[0]
    assert out2.iloc[0].tolist() == [7, 4, 18.0, 10.0]
    assert handle.state.get() == (4, 18.0, 10.0)


def _run_stream(spark, sf_dir, n_files=4):
    work = tempfile.mkdtemp()
    events = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = f"{work}/src"
    # several files + maxFilesPerTrigger=1 => several micro-batches, so
    # state genuinely carries across batches
    events.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_totals_stream(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("update")
        .format("memory")
        .queryName("running_totals_test")
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM running_totals_test").toPandas()


@needs_protobuf
def test_final_totals_match_batch(spark, sf_dir):
    out = _run_stream(spark, sf_dir)
    final = (
        out.sort_values("n_events").groupby("user_id").last().reset_index()
    )
    batch = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("max_v"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert set(final["user_id"]) == set(batch.index)
    for _, r in final.iterrows():
        b = batch.loc[r["user_id"]]
        assert r["n_events"] == b["n"]
        assert abs(r["total"] - b["total"]) < 1e-5
        assert r["max_value"] == b["max_v"]


@needs_protobuf
def test_state_carries_across_microbatches(spark, sf_dir):
    out = _run_stream(spark, sf_dir)
    multi = out.groupby("user_id").size()
    assert (multi > 1).any()
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("n_events")
        assert g["n_events"].is_monotonic_increasing
        assert g["max_value"].is_monotonic_increasing
        assert g["total"].is_monotonic_increasing  # values are positive
