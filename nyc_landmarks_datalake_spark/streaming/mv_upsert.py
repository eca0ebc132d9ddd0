"""Streaming incremental materialized view through the commit log.

The production lakehouse pattern the batch tiers already verify
separately — `q_incremental_mv_refresh` (CDF delta maintenance) and
`q_txlog_merge` (transactional MERGE) — composed as a REAL streaming
query: events arrive file-by-file, each micro-batch aggregates its
delta, reads the current MV snapshot, adds, and commits the merge as
the next table version. The final snapshot must equal the batch
GROUP BY of the whole feed exactly.

Correctness properties exercised:

  * batching-independence — the MV columns are integer counts/sums
    (commutative/associative adds), so ANY micro-batch split yields
    the identical final snapshot, which is what makes the batch oracle
    exact;
  * exactly-once per batch — each commit records its micro-batch id in
    the manifest operation (``mv_delta_b{id}``); a replayed batch
    (crash between the commit and the checkpoint write) finds its op
    already present and skips, so the read-modify-write add never
    double-counts. This is the piece ``streaming_upsert_sink``'s
    replace-semantics merge gets for free but an ADDITIVE merge must
    implement;
  * snapshot isolation — mid-stream readers see a committed version,
    never a half-merged state (inherited from sources/txtable.py).

At 100 TB: each micro-batch shuffles only its delta (map-side
combinable hash agg); the snapshot read + merge is bounded by the MV
size (distinct users), not the feed; version manifests are O(1) each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.scratch import scratch_dir
from nyc_landmarks_datalake_spark.sources import txtable
from nyc_landmarks_datalake_spark.streaming.guard import (
    finish_replay,
    replay_session,
)

MV_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_event_ids BIGINT"


def _committed_ops(path: str) -> set[str]:
    # manifest scan: versions are O(batches), each manifest O(1)
    return {
        txtable._read_manifest(path, v)["operation"]
        for v in txtable._versions(path)
    }


def replay_stream_mv_upsert(
    spark,
    events: DataFrame,
    n_source_files: int = 3,
    timeout_s: int = 300,
) -> DataFrame:
    """Stage the feed as ``n_source_files`` parquet files, replay it
    through the per-batch delta→read→add→commit loop, return the final
    MV snapshot (read with the CALLER's session)."""
    import os

    base = scratch_dir(prefix="stream_mv_")
    src = os.path.join(base, "events")
    tbl = os.path.join(base, "mv")
    ckpt = os.path.join(base, "ckpt")
    events.repartition(n_source_files).write.mode("overwrite").parquet(src)

    sess = replay_session(spark)
    empty = sess.createDataFrame([], MV_SCHEMA)
    txtable.commit(sess, tbl, empty, "create", expected_version=None)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        op = f"mv_delta_b{batch_id}"
        if op in _committed_ops(tbl):
            return  # replayed micro-batch: already merged, skip
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("d_n"),
            F.sum("event_id").cast("long").alias("d_sum"),
        )
        base_v = txtable.current_version(tbl)
        cur = txtable.read_snapshot(sess, tbl, base_v)
        updated = (
            delta.join(cur, "user_id", "left")
            .select(
                "user_id",
                (F.col("d_n") + F.coalesce(F.col("n_events"), F.lit(0)))
                .cast("long")
                .alias("n_events"),
                (F.col("d_sum") + F.coalesce(F.col("sum_event_ids"), F.lit(0)))
                .cast("long")
                .alias("sum_event_ids"),
            )
        )
        from nyc_landmarks_datalake_spark.operators.merge import merge_upsert

        merged = merge_upsert(cur, updated, ["user_id"])
        txtable.commit(sess, tbl, merged, op, base_v)

    q = (
        sess.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish_replay(q, timeout_s, "stream_mv_upsert")
    return txtable.read_snapshot(spark, tbl)


def _register() -> None:
    from nyc_landmarks_datalake_spark.registry import query
    from nyc_landmarks_datalake_spark.sources.catalog import table

    @query(
        "q_stream_mv_upsert",
        sql="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
        FROM events GROUP BY 1
        """,
    )
    def q_stream_mv_upsert(spark, sf_dir: str) -> DataFrame:
        """Per-user event counts maintained as a streaming incremental
        MV: micro-batch deltas added into a transactional commit-log
        table, one version per batch, batch-id idempotence. The final
        snapshot equals the batch GROUP BY of the whole feed."""
        ev = table(spark, sf_dir, "events").select("event_id", "user_id")
        return replay_stream_mv_upsert(spark, ev)


_register()
