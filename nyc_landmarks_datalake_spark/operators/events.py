"""Event-time operators over the ``events`` table: JSON extraction,
tumbling windows, session windows, and time-range self joins.

These are the batch twins of the streaming pipeline in
:mod:`nyc_landmarks_datalake_spark.streaming` — ``F.window`` /
``F.session_window`` are the exact expressions Structured Streaming
uses, so correctness proven here transfers to the streaming path
(streaming-specific semantics — watermarks, late-data drops, triggers —
are exercised in tests/test_streaming.py).

Scale notes: tumbling/session windows group-by (key, window) — one
shuffle, map-side partial aggregation applies. The range self-join is
equi-keyed on user_id first (shuffle/broadcast hash join) with the time
predicate as a post-join filter — never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# JSON extraction (the reference parses sidecar JSON driver-side,
# CSVIngest.java:127-134; here JSON is a data-plane column).
# ---------------------------------------------------------------------------
@query(
    "q_json_props",
    sql=f"""
    SELECT event_type,
           {dsum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # Parse the JSON once per row before aggregating (not once per agg).
    parsed = events.select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        dsum(F.col("k").cast("double")).alias("sum_k"),
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Tumbling window aggregation (15-minute buckets).
# Spark's window() and DuckDB's time_bucket() both align to the epoch
# for minute-granularity widths.
# ---------------------------------------------------------------------------
@query(
    "q_tumbling_window",
    sql=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "15 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Session windows (2h inactivity gap) per user.
# Spark: session_window(); oracle: gaps-and-islands (lag + cumsum).
# Spark starts a NEW session when ts - prev_ts >= gap (an event extends
# a session only while it starts strictly before session_end = prev+gap).
# ---------------------------------------------------------------------------
@query(
    "q_session_window",
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
        SELECT user_id, event_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS last_event_ts,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS session_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "2 hours").alias("sw"), F.col("user_id")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events", "session_value")
    )


# ---------------------------------------------------------------------------
# Range self-join: ordered event pairs within 5 minutes, same user.
# ---------------------------------------------------------------------------
@query(
    "q_range_join_pairs",
    sql="""
    SELECT a.user_id,
           a.event_id AS first_event,
           b.event_id AS second_event,
           a.event_type AS first_type,
           b.event_type AS second_type,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '5 minutes'
    """,
)
def q_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    a = events.alias("a")
    b = events.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("first_event"),
            F.col("b.event_id").alias("second_event"),
            F.col("a.event_type").alias("first_type"),
            F.col("b.event_type").alias("second_type"),
            (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias(
                "gap_us"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sliding window (15-minute width, 5-minute slide): each event lands in
# width/slide = 3 overlapping windows. Spark's window() emits the
# overlap natively; the oracle expands each event into its 3 windows
# via a tiny range unnest (the standard batch twin of a sliding
# stream). The 3x row expansion happens map-side before the hash-agg.
# ---------------------------------------------------------------------------
SLIDE_WIDTH_MIN, SLIDE_STEP_MIN = 15, 5


@query(
    "q_sliding_window",
    sql=f"""
    WITH expanded AS (
        SELECT event_type, value,
               time_bucket(INTERVAL '{SLIDE_STEP_MIN} minutes', ts)
                   - CAST(off AS INT) * INTERVAL '{SLIDE_STEP_MIN} minutes'
                   AS window_start
        FROM events,
             unnest(range({SLIDE_WIDTH_MIN // SLIDE_STEP_MIN})) AS t(off)
    )
    SELECT window_start,
           window_start + INTERVAL '{SLIDE_WIDTH_MIN} minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM expanded
    GROUP BY 1, 2, 3
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", f"{SLIDE_WIDTH_MIN} minutes", f"{SLIDE_STEP_MIN} minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
