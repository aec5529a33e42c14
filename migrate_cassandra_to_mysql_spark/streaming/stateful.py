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
