"""Structured Streaming tier.

The reference's unit of streaming is a *file-arrival event*: one S3
ObjectCreated notification → one Lambda invocation → one object massaged
(CSVIngest.java:28, :211, :217 — note it silently drops all but the
first record of a batched event). Spark's file source does the same
discovery natively — new files in the raw/ zone are picked up exactly
once per micro-batch, checkpointed — so ``stream_ingest`` IS the
reference's production path, minus the Lambda plumbing and the
one-record-per-event bug.

On top (ABSENT in the reference, SURVEY §2.B): event-time watermarks,
tumbling/session windows, and streaming dedup. The batch twins of the
window aggregations are oracle-checked in operators/events.py; here the
same expressions run under the streaming engine with late-data drops.

Scale: file-source ingest is embarrassingly parallel (one task per
file split); windowed aggs shuffle on (key, window) with state in the
state store — watermarks bound state size, which is what makes a
100 TB/day stream feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_ingest(
    spark: SparkSession,
    raw_dir: str,
    schema: T.StructType,
    dest_dir: str,
    checkpoint_dir: str,
    partition_cols: list[str] | None = None,
    transform=None,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source CSV ingest into checkpointed parquet (R1→R14)."""
    stream = (
        spark.readStream.format("csv")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .schema(schema)
        .load(raw_dir)
    )
    if transform is not None:
        stream = transform(stream)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    window_duration: str = "15 minutes",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a
    watermark: rows later than the watermark are dropped."""
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "2 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Session-window aggregation per user (merging state handled by the
    streaming engine's session-window state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup: state bounded by the watermark (duplicates
    arriving later than the watermark are not suppressed — the standard
    state/size tradeoff)."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        (keys or ["event_id"]) + ["ts"]
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small)
    static dimension — planned as a broadcast hash join per batch, no
    streaming state at all. The canonical enrichment shape (events x
    user/customer dims) at any scale."""
    return events.join(F.broadcast(dim), on)


def stream_stream_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: attribute each purchase
    to a prior view by the same user within the attribution window.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store can evict rows older than
    (watermark + window) — the requirement for an unbounded stream-stream
    join to run with bounded state."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


def stream_upsert_sink(
    stream: DataFrame,
    dest_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_cols: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC upsert via foreachBatch: each micro-batch is first
    compacted to its newest row per key, then SCD1-merged into the
    parquet silver table. This is the Delta-less form of
    ``MERGE INTO silver USING batch`` — the same two primitives
    (keep_latest + merge_upsert) the batch tier exposes, driven by the
    streaming engine with exactly-once batch IDs from the checkpoint.

    The full-table rewrite per batch is the parquet limitation (no
    transactional row updates); with a table format the merge would
    target only matched files. Keyed layout (bucketing) bounds the
    rewrite at scale.

    Durability: the merged table is written to a sibling temp directory
    and swapped in with directory renames, so the previous silver table
    stays intact on disk until the new one is fully committed — a
    mid-write executor loss fails the batch for retry with the old table
    untouched (no reliance on cached lineage blocks). On a local/HDFS
    filesystem the rename is atomic; on S3-like stores the real fix is a
    transactional table format (see SCALING.md) — this sink is the
    filesystem form of that commit protocol."""
    from nyc_landmarks_datalake_spark.operators.merge import (
        keep_latest,
        merge_upsert,
    )

    spark = stream.sparkSession

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        import glob as _glob
        import os as _os
        import shutil as _shutil

        # crash recovery: a previous batch may have died between the two
        # renames below (dest gone, .replaced-* still holding the data).
        # When dest_dir EXISTS it is authoritative and every scratch dir
        # is garbage from an interrupted batch — sweep them, or a
        # replayed batch id would hit ENOTEMPTY renaming onto its own
        # leftover, and a stale higher-id .replaced dir could shadow
        # real data in a later recovery.
        if not _os.path.isdir(dest_dir):
            leftovers = sorted(_glob.glob(f"{dest_dir}.replaced-*"))
            if leftovers:
                _os.rename(leftovers[-1], dest_dir)
        else:
            for stale in _glob.glob(f"{dest_dir}.replaced-*") + _glob.glob(
                f"{dest_dir}.inprogress-*"
            ):
                _shutil.rmtree(stale, ignore_errors=True)

        compacted = keep_latest(batch, keys, order_cols)
        # explicit existence check, NOT try/except around the read: a
        # transient read or merge failure on a populated table must
        # propagate (and fail the batch for retry) — swallowing it here
        # would overwrite the silver table with just this micro-batch.
        if _os.path.isdir(dest_dir) and _glob.glob(
            _os.path.join(dest_dir, "*.parquet")
        ):
            base = spark.read.parquet(dest_dir)
            merged = merge_upsert(base, compacted, keys)
        else:
            merged = compacted  # first batch: no silver table yet

        tmp_dir = f"{dest_dir}.inprogress-{batch_id:020d}"
        old_dir = f"{dest_dir}.replaced-{batch_id:020d}"
        merged.write.mode("overwrite").parquet(tmp_dir)
        # swap only after the new table is fully on disk
        if _os.path.isdir(dest_dir):
            _os.rename(dest_dir, old_dir)
        _os.rename(tmp_dir, dest_dir)
        _shutil.rmtree(old_dir, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
