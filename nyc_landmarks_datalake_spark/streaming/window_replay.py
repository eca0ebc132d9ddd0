"""Streaming windowed aggregation replayed under the oracle gate.

The tumbling/session batch twins (operators/events.py) pin window
SEMANTICS; these replays pin the streaming ENGINE: events arrive
file-by-file, the windowed aggregate accumulates in the state store
across micro-batches, and the final complete-mode emission must equal
the batch GROUP BY bit-exactly.

Determinism: complete mode emits the full aggregate every trigger, so
the LAST emission covers all input regardless of arrival order; the
value sum accumulates in DECIMAL (exact, order-independent) inside the
streaming state exactly like the batch dsum path — a double sum here
would vary with state-update order. The foreachBatch sink overwrites,
so what survives is the final complete snapshot.

Scale: complete mode holds every window in state — right for bounded
window counts (dashboard rollups); unbounded production windows pair
append mode with a watermark instead (late-drop semantics covered in
tests/test_streaming.py).
"""

from __future__ import annotations

import os
import shutil

from nyc_landmarks_datalake_spark.scratch import scratch_dir
from nyc_landmarks_datalake_spark.streaming.guard import replay_session

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: session-scoped replay staging ROOTS, one per (zone, sf-ish) key —
#: bench loops invoke replay queries repeatedly and a mkdtemp per call
#: leaks a full events copy + checkpoint + output per invocation (the
#: r8-ADVICE leak class fixed for q_compaction_census). Each invocation
#: stages into a fresh VERSIONED subdir (v0, v1, ...) of the shared
#: root: the checkpoint MUST be fresh per replay (a reused complete-mode
#: checkpoint would skip the micro-batch walk under test) and earlier
#: invocations' lazy DataFrames keep reading their own untouched output
#: subdir. Growth is bounded: each invocation deletes every version
#: older than its predecessor, so at most two versions exist at a time.
_REPLAY_ZONES: dict[str, tuple[str, int]] = {}


def replay_stream_agg(
    spark,
    rows: DataFrame,
    group_cols: list[Column],
    zone: str,
    n_source_files: int = 3,
    timeout_s: int = 300,
) -> DataFrame:
    """Stage ``rows`` (must carry ``value``) and replay them file-by-file
    through a streaming ``groupBy(*group_cols)`` count + decimal-sum
    aggregate; return the final complete-mode snapshot.

    One replay protocol for every streaming-replay query (tumbling,
    sliding, session): readStream with maxFilesPerTrigger=1 so each
    staged file is its own micro-batch, complete-mode foreachBatch
    overwrite sink, availableNow trigger. The returned snapshot is
    EAGERLY materialized (``localCheckpoint``) so it stays readable no
    matter how many later invocations rotate the two-version staging
    retention underneath it — snapshots are tiny aggregates, so pinning
    their blocks costs nothing next to the replay itself.
    """
    root, version = _REPLAY_ZONES.get(zone) or (
        scratch_dir(prefix=f"{zone}_"),
        0,
    )
    _REPLAY_ZONES[zone] = (root, version + 1)
    base = os.path.join(root, f"v{version}")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    rows.repartition(n_source_files).write.mode("overwrite").parquet(src)
    for stale in range(version - 1):
        shutil.rmtree(os.path.join(root, f"v{stale}"), ignore_errors=True)

    # run the replay on the low-state-partition session clone: one
    # state-store instance per shuffle partition per micro-batch, so
    # the parent's 32 partitions are pure store-provider overhead at
    # replay scale (the stream_join.py discipline, completed r16)
    sess = replay_session(spark)
    stream = (
        sess.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("dec_total"),
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout with the query
    # still RUNNING — reading ``out`` then would return a partial
    # mid-replay snapshot (or nothing), a silently-wrong result. Fail
    # loudly instead; stop() so the orphan doesn't keep writing.
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming replay ({zone}) did not finish within "
            f"{timeout_s}s; refusing to read a partial snapshot"
        )
    return spark.read.parquet(out).localCheckpoint(eager=True)


def replay_stream_tumbling_agg(
    spark,
    rows: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    n_source_files: int = 3,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay ``rows`` (ts, event_type, value) through a streaming
    (sliding-)window aggregate; returns the final complete snapshot."""
    return replay_stream_agg(
        spark,
        rows,
        [
            F.window("ts", window, slide or window).alias("w"),
            F.col("event_type"),
        ],
        zone="stream_window",
        n_source_files=n_source_files,
        timeout_s=timeout_s,
    )


def _register() -> None:
    from nyc_landmarks_datalake_spark.functions.numeric import dsum_sql
    from nyc_landmarks_datalake_spark.registry import query
    from nyc_landmarks_datalake_spark.sources.catalog import table

    @query(
        "q_stream_tumbling_replay",
        sql=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {dsum_sql('value')} AS total_value
        FROM events
        GROUP BY 1, 2
        """,
    )
    def q_stream_tumbling_replay(spark, sf_dir: str) -> DataFrame:
        ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
        snap = replay_stream_tumbling_agg(spark, ev)
        return snap.select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("dec_total").cast("double").alias("total_value"),
        )

    @query(
        "q_stream_sliding_replay",
        sql=f"""
        WITH offs(k) AS (VALUES (0), (1))
        SELECT time_bucket(INTERVAL '1 hour', ts)
                   - k * INTERVAL '1 hour' AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {dsum_sql('value')} AS total_value
        FROM events CROSS JOIN offs
        GROUP BY 1, 2
        """,
    )
    def q_stream_sliding_replay(spark, sf_dir: str) -> DataFrame:
        """Sliding windows (2h / slide 1h) through the REAL streaming
        engine: each event lands in exactly two overlapping windows,
        both accumulated in the state store across micro-batches. The
        oracle expands each event into its two window starts with a
        2-row VALUES join — overlap assignment, per-window counts and
        the decimal-exact totals must all agree bit-exactly."""
        ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
        snap = replay_stream_tumbling_agg(
            spark, ev, window="2 hours", slide="1 hour"
        )
        return snap.select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("dec_total").cast("double").alias("total_value"),
        )


_register()


def _register_session() -> None:
    from nyc_landmarks_datalake_spark.functions.numeric import dsum_sql
    from nyc_landmarks_datalake_spark.registry import query
    from nyc_landmarks_datalake_spark.sources.catalog import table

    @query(
        "q_stream_session_replay",
        sql=f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                >= INTERVAL '2 hours'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessioned AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               {dsum_sql('value')} AS session_value
        FROM sessioned
        GROUP BY user_id, session_id
        """,
    )
    def q_stream_session_replay(spark, sf_dir: str) -> DataFrame:
        """Session windows (2h gap, per user) through the REAL streaming
        engine. The batch twin (q_session_window) pins gap semantics;
        this replay pins the hard streaming part: sessions MERGE in the
        state store — an early micro-batch can close two provisional
        sessions that a later file's bridging event fuses into one, so
        the final complete-mode snapshot proves cross-batch session
        merge, not just windowed accumulation. Events arrive in
        3 arbitrary file-order batches (maxFilesPerTrigger=1) and the
        result must still equal the batch gaps-and-islands oracle
        bit-exactly (decimal state sums — order-independent)."""
        ev = table(spark, sf_dir, "events").select(
            "ts", "user_id", "event_id", "value"
        )
        snap = replay_stream_agg(
            spark,
            ev,
            [F.session_window("ts", "2 hours").alias("sw"), F.col("user_id")],
            zone="stream_session",
        )
        return snap.select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            F.col("dec_total").cast("double").alias("session_value"),
        )


_register_session()
