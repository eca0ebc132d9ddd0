"""Streaming deduplication — the exactly-once ingest pattern.

``dropDuplicates`` over a streaming source keeps per-key state in the
state store (one shuffle to co-locate keys) and emits each key exactly
once, at first sight, across ALL micro-batches. This is the dedup half
of at-least-once ingestion: upstream retries/replays collapse to one
row downstream.

Replay harness mirrors streaming/stateful.py: the batch table is staged
to files and streamed with ``maxFilesPerTrigger=1``, so the no-re-emit
guarantee is exercised across REAL micro-batch boundaries (a key seen
in batch 0 must stay suppressed in batch 3 via recovered state, not
within-batch distinct).

Determinism note: streaming dropDuplicates keeps the FIRST row per key,
and "first" depends on file/partition arrival order — so the registered
query projects ONLY the key columns before deduplicating. The emitted
set is then exactly the distinct key set regardless of arrival order,
which is what makes the operator oracle-checkable bit-exactly.

Scale: state is one fixed-size entry per distinct key. For unbounded
production streams pair with ``withWatermark`` +
``dropDuplicatesWithinWatermark`` so state ages out; the availableNow
replay here omits the watermark because the staged table is finite
(same reasoning as the NoTimeout choice in stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nyc_landmarks_datalake_spark.scratch import scratch_dir
from nyc_landmarks_datalake_spark.streaming.guard import finish_replay, replay_session


def replay_stream_dedup(
    spark,
    rows: DataFrame,
    keys: list[str],
    n_source_files: int = 4,
    timeout_s: int = 300,
) -> DataFrame:
    """Stage ``rows`` and replay them file-by-file through streaming
    ``dropDuplicates(keys)``; return everything emitted. The temp dir
    must outlive the returned lazy DataFrame (OS tmp reaper cleans it —
    never clean up inside a registered query callable)."""
    import os

    base = scratch_dir(prefix="stream_dedup_")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    rows.repartition(n_source_files).write.mode("overwrite").parquet(src)

    # low-state-partition replay clone (stream_join.py discipline):
    # one state-store instance per shuffle partition per stateful
    # operator per micro-batch makes the parent session's 32
    # partitions pure store overhead at replay scale
    sess = replay_session(spark)
    stream = (
        sess.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.dropDuplicates(keys)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish_replay(q, timeout_s, "stream_dedup")
    return spark.read.parquet(out)


def replay_stream_dedup_watermarked(
    spark,
    rows: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "3650 days",
    n_source_files: int = 4,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay through ``withWatermark + dropDuplicatesWithinWatermark``
    — the bounded-state production form of streaming dedup (state for a
    key is dropped once the watermark passes its event time, so an
    unbounded stream holds only a watermark-window of keys, not the full
    key history that plain ``dropDuplicates`` accumulates).

    The registered query picks ``delay`` longer than the staged data's
    event-time span, so no state is evicted mid-replay and the emitted
    set is EXACTLY the distinct key set — which is what makes the
    operator oracle-checkable bit-exactly while still executing the
    DeduplicateWithinWatermark state machinery (watermark tracking,
    eviction timers) across real micro-batches. ``keys`` must include
    the event-time column: first-seen rows carry arbitrary non-key
    columns under arrival-order nondeterminism (same reasoning as
    replay_stream_dedup's key-only projection)."""
    import os

    base = scratch_dir(prefix="stream_dedup_wm_")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    rows.repartition(n_source_files).write.mode("overwrite").parquet(src)

    # low-state-partition replay clone (stream_join.py discipline):
    # one state-store instance per shuffle partition per stateful
    # operator per micro-batch makes the parent session's 32
    # partitions pure store overhead at replay scale
    sess = replay_session(spark)
    stream = (
        sess.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(keys)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish_replay(q, timeout_s, "stream_dedup")
    return spark.read.parquet(out)


def _register_queries() -> None:
    from nyc_landmarks_datalake_spark.registry import query
    from nyc_landmarks_datalake_spark.sources.catalog import table

    @query(
        "q_stream_dedup",
        sql="""
        SELECT DISTINCT user_id, event_type FROM events
        """,
    )
    def q_stream_dedup(spark, sf_dir: str) -> DataFrame:
        rows = table(spark, sf_dir, "events").select("user_id", "event_type")
        return replay_stream_dedup(spark, rows, ["user_id", "event_type"])

    @query(
        "q_stream_dedup_watermarked",
        sql="""
        SELECT DISTINCT user_id, event_type, ts FROM events
        """,
    )
    def q_stream_dedup_watermarked(spark, sf_dir: str) -> DataFrame:
        rows = table(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts"
        )
        return replay_stream_dedup_watermarked(
            spark, rows, ["user_id", "event_type", "ts"]
        )


_register_queries()
