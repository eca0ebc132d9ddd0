"""As-of join — a temporal operator Spark has no built-in for.

``asof_join(left, right, on, by)`` matches each left row to the most
recent right row with ``right.on <= left.on`` within the same ``by``
group (the classic "latest order before this event" lookup).

Implementation: co-shuffle both sides on the ``by`` key with
``cogroup().applyInPandas`` and run a vectorized ``pandas.merge_asof``
per key group. This is the scalable shape for 100 TB:

- exactly one shuffle per side (hash partition on the key, the same
  shuffle a join would need anyway);
- per-group work is O(n log n) sort + linear merge, Arrow-batched;
- no driver collect, no broadcast of the big side, and AQE skew-split
  still applies to the exchange.

An alternative composition (union + last(ignorenulls) window) is kept in
tests as a cross-check. Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    how: str = "inner",
) -> DataFrame:
    """Generic as-of join: latest right row with on_right <= on_left per key.

    Right-side column names must not collide with left's (rename first).
    """
    right_cols = [f for f in right.schema.fields]
    out_schema = T.StructType(list(left.schema.fields) + right_cols)
    lcols = [f.name for f in left.schema.fields]
    rcols = [f.name for f in right_cols]

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=lcols + rcols)
        ldf = ldf.sort_values(on_left, kind="mergesort")
        rdf = rdf.sort_values(on_right, kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf,
            left_on=on_left,
            right_on=on_right,
            direction="backward",
            allow_exact_matches=True,
        )
        if how == "inner":
            merged = merged.dropna(subset=[on_right])
        return merged[lcols + rcols]

    return (
        left.groupBy(by_left)
        .cogroup(right.groupBy(by_right))
        .applyInPandas(merge, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# For each event: the user's most recent order at or before the event.
# Orders deduped to one row per (custkey, orderdate) — max orderkey —
# so the as-of match is uniquely determined in both engines.
# ---------------------------------------------------------------------------
@query(
    "q_asof_join_events_orders",
    sql="""
    WITH o AS (
        SELECT o_custkey AS cust_id,
               o_orderdate AS order_ts,
               MAX(o_orderkey) AS last_orderkey
        FROM orders
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, o.order_ts, o.last_orderkey
    FROM events e
    ASOF JOIN o
      ON e.user_id = o.cust_id AND e.ts >= o.order_ts
    """,
)
def q_asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    joined = asof_join(
        events,
        orders,
        on_left="ts",
        on_right="order_ts",
        by_left="user_id",
        by_right="cust_id",
        how="inner",
    )
    return joined.select("event_id", "user_id", "ts", "order_ts", "last_orderkey")
