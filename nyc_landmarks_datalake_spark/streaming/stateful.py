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

from nyc_landmarks_datalake_spark.scratch import scratch_dir
from nyc_landmarks_datalake_spark.streaming.guard import finish_replay, replay_session

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


# ---------------------------------------------------------------------------
# Integer-exact variant + replay runner: puts applyInPandasWithState
# itself under the driver's bit-exact oracle gate. All columns are
# int64 (epoch-µs timestamps, micro-unit values) so pandas accumulation
# is exact and timezone never enters the comparison.
# ---------------------------------------------------------------------------
EXACT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_micros", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_micros", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile_exact(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["value_micros"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_micros": [total],
            "last_ts_us": [last_us],
        }
    )


def user_profiles_exact(events: DataFrame) -> DataFrame:
    """Streaming per-user profile over pre-integered inputs
    (``user_id``, ``ts_us``, ``value_micros`` — all int64): count, exact
    micro-unit value sum, last-seen epoch-µs. Same state-store posture
    as :func:`user_profiles`; NoTimeout so availableNow replays drain."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile_exact,
        outputStructType=EXACT_OUTPUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def replay_user_profiles(
    spark, events: DataFrame, n_source_files: int = 4, timeout_s: int = 300
) -> DataFrame:
    """Run :func:`user_profiles_exact` as a REAL streaming query
    (availableNow, ``maxFilesPerTrigger=1`` so state genuinely carries
    across micro-batches) and return the final per-user profiles.

    The batch source is staged to a temp dir and replayed file-by-file;
    in update mode a user re-emits with strictly growing ``n_events``
    whenever a batch touches it, so the final profile is the max-count
    row per user. The temp dir must outlive the returned (lazy)
    DataFrame, so it is left for the OS tmp reaper."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = scratch_dir(prefix="stateful_profiles_")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    events.repartition(n_source_files).write.mode("overwrite").parquet(src)

    # low-state-partition replay clone (stream_join.py discipline):
    # one state-store instance per shuffle partition per stateful
    # operator per micro-batch makes the parent session's 32
    # partitions pure store overhead at replay scale
    sess = replay_session(spark)
    stream = (
        sess.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (
        user_profiles_exact(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish_replay(q, timeout_s, "stateful_profiles")
    emitted = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _register_queries() -> None:
    """Driver-checked twin: the streaming stateful operator replayed
    over the events table vs a plain DuckDB GROUP BY — the one oracle
    row covering the applyInPandasWithState tier (state recovery across
    micro-batches included, via maxFilesPerTrigger=1)."""
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.registry import query
    from nyc_landmarks_datalake_spark.sources.catalog import table

    @query(
        "q_stateful_user_profiles",
        sql="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
                   AS total_value_micros,
               MAX(epoch_us(ts)) AS last_ts_us
        FROM events
        GROUP BY user_id
        """,
    )
    def q_stateful_user_profiles(spark, sf_dir: str) -> DataFrame:
        events = table(spark, sf_dir, "events").select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("value_micros"),
        )
        return replay_user_profiles(spark, events)


_register_queries()
