"""Custom stateful streaming operator via applyInPandasWithState.

The built-in streaming ops (windows, sessions, dropDuplicates) cover the
standard cases; this is the escape hatch for arbitrary per-key state —
here a running per-user profile (event count, value sum, last-seen ts)
maintained across micro-batches with a processing-time timeout evicting
idle keys.

Scale: state lives in the state store partitioned by key (one shuffle to
co-locate); per-key state is a fixed-size tuple, and the timeout bounds
total state to active keys — the same posture that keeps watermarked
windows feasible on unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _make_update_profile(evict_idle_ms: int | None):
    def _update_profile(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
        state.update((n, total, last_us))
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts_us": [last_us],
            }
        )

    return _update_profile


def user_profiles(events: DataFrame, evict_idle_ms: int | None = None) -> DataFrame:
    """Streaming per-user running profile (count/sum/last-seen).

    ``evict_idle_ms`` enables processing-time state eviction for
    continuous production streams. Leave None for availableNow /
    batch-catchup runs: a pending processing-time timeout keeps the
    query alive after the data is drained (it schedules further batches
    to service future timeouts), so availableNow would never terminate.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(evict_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
