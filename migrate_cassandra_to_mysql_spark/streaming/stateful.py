"""Custom stateful streaming operator: gap-based sessionization.

The batch twin (catalog query `events_sessionize`) uses lag + running-sum
windows; in a stream those windows are unbounded, so state must be explicit.
This operator keeps one small state record per user (session id counter,
last-seen timestamp) via `applyInPandasWithState` — the Spark primitive for
operators the built-in streaming surface can't express (SURVEY §2.7/§2.8:
the reference has no UDF/stateful surface at all).

Scale design: state is O(active users), not O(events); a processing-time
timeout expires idle users' state so it cannot grow unboundedly. Events
arrive grouped by user_id (the groupBy shuffles each user's events to one
task), and each micro-batch's pandas frames are Arrow-transferred.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, session_id bigint"
STATE_SCHEMA = "session_id bigint, last_ts double"

SESSION_GAP_S = 1800.0


def _make_sessionizer(continuous: bool):
    def sessionize_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Timeout callback: the group's user went idle past the timeout —
        # drop its state and emit nothing. (Calling update/
        # setTimeoutDuration here, or yielding an untyped empty frame,
        # crashes the Arrow worker and the cleanup batch retries forever.)
        if state.hasTimedOut:
            state.remove()
            return

        (user_id,) = key
        if state.exists:
            session_id, last_ts = state.get
        else:
            session_id, last_ts = 0, None

        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                ts_s = row["ts"].timestamp()
                if last_ts is None or ts_s - last_ts > SESSION_GAP_S:
                    session_id += 1
                last_ts = ts_s
                out.append((user_id, row["event_id"], row["ts"], session_id))

        if out:
            state.update((session_id, last_ts))
            if continuous:
                state.setTimeoutDuration(3_600_000)  # expire idle users, 1h
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "session_id"]
            )

    return sessionize_group


ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def rocksdb_state_conf(
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> dict[str, str]:
    """Session conf switching streaming state to the RocksDB provider.

    The default HDFSBackedStateStoreProvider keeps every key's state as
    JVM heap objects — fine for thousands of keys, an OOM at the 100 TB
    design point (state ~ O(active users/keys), easily 10^8+). RocksDB
    spills state to local SSD with a block-cache working set, and
    changelog checkpointing uploads only the per-batch delta instead of
    snapshotting the full store every commit.

    Pass to `session.get_spark(extra_conf=rocksdb_state_conf())` (conf is
    session-wide; set before the streaming query starts).
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": str(
            changelog_checkpointing
        ).lower(),
    }
    if bounded_memory_mb is not None:
        conf["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
        conf["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(
            bounded_memory_mb
        )
    return conf


def sessionize_stream(events_stream: DataFrame, continuous: bool = False) -> DataFrame:
    """Assign gap-based session ids over an event stream.

    continuous=False (snapshot/drain mode, Trigger.AvailableNow): NoTimeout —
    bounded input, no idle-state cleanup batches, query terminates cleanly.
    continuous=True (long-running stream): ProcessingTimeTimeout expires
    idle users' state after 1h so state stays O(active users). NOTE: with
    ProcessingTimeTimeout, AvailableNow runs extra state-cleanup batches
    and may not terminate until timeouts resolve — use continuous mode only
    with a real continuous trigger.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if continuous
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(continuous),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# --- transformWithState (Spark 4 arbitrary-state API) ---------------------
#
# applyInPandasWithState above is the Spark 3.x-era primitive; Spark 4
# replaces it with transformWithStateInPandas: typed named state slots
# (value/list/map) with per-state TTL, timers, and an initial-state hook —
# the operator model a long-lived 100 TB stream actually needs (state
# schema evolution and TTL without hand-rolled timeout bookkeeping).
# running_totals_stream is the streaming twin of the reference's running
# max-token high-water tracking (snapshot_use_pyspark.py:228,258 and the
# batch catalog row `running_max_token`): per-key event count / total /
# high-water mark, updated per micro-batch.

RUNNING_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total double, max_value double"
)
RUNNING_STATE_SCHEMA = "n bigint, total double, max_v double"


def _lazy_processor_cls():
    # StatefulProcessor imports touch streaming internals; keep them out
    # of module import so batch-only consumers never pay for them.
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, sum, max) with a 1h state TTL: a
        user idle past the TTL restarts from zero — the bounded-state
        contract (O(active users), like the sessionizer's timeout but
        declared ONCE on the state slot instead of managed per batch)."""

        def __init__(self, ttl_ms: int | None = 3_600_000):
            self._ttl_ms = ttl_ms

        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", RUNNING_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._totals.exists():
                n, total, max_v = self._totals.get()
            else:
                n, total, max_v = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                max_v = max(max_v, float(pdf["value"].max()))
            self._totals.update((n, total, max_v))
            yield pd.DataFrame(
                [(user_id, n, round(total, 6), max_v)],
                columns=["user_id", "n_events", "total", "max_value"],
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor


def running_totals_stream(
    events_stream: DataFrame, ttl_ms: int | None = 3_600_000
) -> DataFrame:
    """Per-user running (n_events, total, max_value) over an event
    stream via transformWithStateInPandas — one Update-mode row per user
    per micro-batch that saw that user.

    Scale design: state is one 3-field record per ACTIVE user (TTL
    evicts idle users inside the state store — no cleanup batches, no
    timeout plumbing in the operator body); events shuffle once on
    user_id; pandas batches arrive Arrow-transferred. Totals are rounded
    to 6 dp on emit so cross-run comparisons don't chase float dust from
    batch-boundary summation order.

    Environment gate: EXECUTING a transformWithState query requires the
    `protobuf` package (Spark's Python state-server protocol speaks
    protobuf; plan construction does not). This sandbox ships no
    protobuf and installs are off-limits, so the end-to-end test
    (tests/test_transform_with_state.py) skips when the import fails —
    the applyInPandasWithState sessionizer above carries the EXECUTED
    custom-stateful-operator coverage; this operator is the Spark-4 API
    form of the same contract.
    """
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        _lazy_processor_cls()(ttl_ms),
        outputStructType=RUNNING_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
