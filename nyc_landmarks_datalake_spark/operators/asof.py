"""As-of join — a temporal operator Spark has no built-in for.

``asof_join(left, right, ...)`` matches each left row to the most recent
right row with ``right.on <= left.on`` within the same ``by`` group (the
classic "latest order before this event" lookup).

Two strategies, equivalence-tested against each other and the DuckDB
ASOF JOIN oracle:

- ``window`` (default): union both sides into one keyed stream, sort
  within key by (ts, side) and carry the latest right row forward with
  ``last(ignorenulls)`` over an unbounded-preceding frame. 100% JVM
  (whole-stage codegen windows), exactly ONE shuffle on the key —
  this is the 100 TB shape and ~20x faster than the Python path at
  sf0.1 (1.5s vs 28s measured).
- ``cogroup``: co-shuffle + ``applyInPandas`` with a vectorized
  ``pandas.merge_asof`` per key group. Kept as the template for as-of
  variants the window trick can't express (nearest-in-time both
  directions, tolerance bounds, non-monotonic tie rules).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
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
    strategy: str = "window",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: per key, the latest right row with on_right <=
    on_left (``direction='backward'``, the default) or the earliest
    right row with on_right >= on_left (``direction='forward'`` —
    next-event attribution, lead-time joins).

    Right-side column names must not collide with left's (rename first).
    ``how`` is 'inner' (drop unmatched left rows) or 'left'.

    Determinism precondition: right rows must be unique per
    ``(by_right, on_right)``. When several right rows tie on exactly
    the same key and timestamp, which one is returned is
    plan-dependent (the window orders by ``on_right`` only, and the
    cogroup path relies on pandas ``merge_asof`` tie behavior) — both
    directions are affected. Dedupe the right side first (as every
    registered query here does) or the result is not stable across
    partitionings/engines.
    """
    if strategy == "window":
        return _asof_window(
            left, right, on_left, on_right, by_left, by_right, how, direction
        )
    if strategy == "cogroup":
        if direction != "backward":
            raise ValueError("cogroup strategy implements backward only")
        return _asof_cogroup(left, right, on_left, on_right, by_left, by_right, how)
    raise ValueError(f"unknown strategy {strategy!r}")


def _asof_window(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    how: str,
    direction: str = "backward",
) -> DataFrame:
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    lcols = left.columns
    rcols = right.columns
    # The right row travels as ONE struct (non-null for every right row
    # even when its members are null), so the window carries the whole
    # matched row atomically — per-column last(ignorenulls) would fill
    # a null member from an OLDER right row, mixing rows; and the
    # struct's own null-ness is the exact match indicator.
    r_struct_t = T.StructType(right.schema.fields)
    r_stream = right.select(
        F.col(by_right).alias("__key"),
        F.col(on_right).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    # One unioned stream: right rows sort before left rows at equal ts
    # (is_left asc ⇒ exact matches are visible to the left row).
    l_stream = left.select(
        F.col(by_left).alias("__key"),
        F.col(on_left).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    if direction == "backward":
        # right rows sort before left at equal ts (inclusive match),
        # and the latest right row so far carries forward
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last(F.col("__r"), ignorenulls=True).over(w)
    else:
        # forward: right rows sort after left at equal ts (inclusive),
        # and the EARLIEST right row at-or-after carries backward via a
        # following frame — same single shuffle, mirrored frame
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first(F.col("__r"), ignorenulls=True).over(w)
    carried = r_stream.unionByName(l_stream).select(
        "*", carry.alias("__rm")
    )
    out = carried.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__rm").isNotNull())
    return out.select(
        *lcols, *[F.col("__rm").getField(c).alias(c) for c in rcols]
    )


def _asof_cogroup(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    how: str,
) -> DataFrame:
    right_fields = list(right.schema.fields)
    out_schema = T.StructType(list(left.schema.fields) + right_fields)
    lcols = [f.name for f in left.schema.fields]
    rcols = [f.name for f in right_fields]

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
        strategy="window",
    )
    return joined.select("event_id", "user_id", "ts", "order_ts", "last_orderkey")


@query(
    "q_asof_forward_join",
    sql="""
    WITH p AS (
        SELECT user_id AS p_user, ts AS purchase_ts,
               MAX(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, p.purchase_ts, p.purchase_id
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') e
    ASOF JOIN p
      ON e.user_id = p.p_user AND e.ts <= p.purchase_ts
    """,
)
def q_asof_forward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click attributed to the same user's NEXT
    purchase (conversion / lead-time attribution). Same single-shuffle
    window machinery as the backward form with the frame mirrored
    (currentRow..unboundedFollowing + first(ignorenulls)); DuckDB's
    native ASOF JOIN with ``<=`` is the oracle. Purchases dedupe to
    one row per (user, ts) — max event_id — so the match is uniquely
    determined in both engines."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
        )
        .agg(F.max("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on_left="ts",
        on_right="purchase_ts",
        by_left="user_id",
        by_right="p_user",
        how="inner",
        strategy="window",
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts", "purchase_ts", "purchase_id"
    )
