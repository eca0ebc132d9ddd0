"""Window-function surface: ranking, running totals, lag/lead, ntile,
percent_rank, and range-framed windows.

ABSENT from the reference (SURVEY §2.B) — standard analytics-tier ops.

Scale notes: window partitions shuffle once on the partition key; frames
evaluate within sorted partitions with no extra shuffle. Skewed partition
keys (a single hot user) are the risk at 100 TB — key choices here
(custkey, user_id) are high-cardinality/uniform in this schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Top-k per group via row_number (the scalable top-k idiom).
# ---------------------------------------------------------------------------
@query(
    "q_topk_per_group",
    sql="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rk
        FROM customer
    )
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rk")
    )


# ---------------------------------------------------------------------------
# Running total per customer (rows-framed cumulative sum).
# Cumulative sums are order-dependent float chains, but within one
# partition both engines accumulate in the same ORDER BY order over
# identical doubles — still, we go through decimal for bit-stability.
# ---------------------------------------------------------------------------
@query(
    "q_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(wseq).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# lag/lead over an event stream.
# ---------------------------------------------------------------------------
@query(
    "q_lag_lead_events",
    sql="""
    SELECT event_id, user_id, ts,
           lag(event_type) OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts))
        .cast("long")
        .alias("secs_since_prev"),
    )


# ---------------------------------------------------------------------------
# ntile + percent_rank + dense_rank battery.
# ---------------------------------------------------------------------------
@query(
    "q_rank_battery",
    sql="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
           CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_rank,
           CAST(rank() OVER (ORDER BY c_nationkey) AS BIGINT) AS nation_rank
    FROM customer
    """,
)
def q_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w_bal = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w_bal).cast("long").alias("quartile"),
        F.percent_rank().over(w_bal).alias("pct_rank"),
        F.dense_rank().over(Window.orderBy("c_mktsegment")).cast("long").alias("seg_rank"),
        F.rank().over(Window.orderBy("c_nationkey")).cast("long").alias("nation_rank"),
    )


# ---------------------------------------------------------------------------
# RANGE-framed window: 30-day trailing order count per customer.
# Order key is an integer day offset so both engines use numeric RANGE.
# ---------------------------------------------------------------------------
@query(
    "q_range_window_30d",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', TIMESTAMP '1990-01-01 00:00:00', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_trailing_30d
    FROM orders
    """,
)
def q_range_window_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("long").alias("orders_trailing_30d"),
    )
