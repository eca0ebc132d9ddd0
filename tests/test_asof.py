"""The two as-of strategies (JVM window vs cogroup+merge_asof) must
produce identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.operators.asof import asof_join
from nyc_landmarks_datalake_spark.sources.catalog import table


def _events_orders(spark, sf_dir):
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    return events, orders


def _run(spark, sf_dir, strategy, how):
    events, orders = _events_orders(spark, sf_dir)
    df = asof_join(
        events,
        orders,
        on_left="ts",
        on_right="order_ts",
        by_left="user_id",
        by_right="cust_id",
        how=how,
        strategy=strategy,
    )
    pdf = df.toPandas().sort_values(["event_id"]).reset_index(drop=True)
    return pdf[["event_id", "user_id", "ts", "order_ts", "last_orderkey"]]


def test_strategies_agree_inner(spark, sf_small):
    a = _run(spark, sf_small, "window", "inner")
    b = _run(spark, sf_small, "cogroup", "inner")
    assert a.equals(b), "window vs cogroup mismatch (inner)"


def test_left_keeps_unmatched(spark, sf_small):
    events, orders = _events_orders(spark, sf_small)
    n_events = events.count()
    out = asof_join(
        events, orders,
        on_left="ts", on_right="order_ts",
        by_left="user_id", by_right="cust_id",
        how="left", strategy="window",
    )
    assert out.count() == n_events


def test_asof_window_matches_atomically_with_null_members(spark):
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 20)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 5, None, "a"), (1, 15, 99, None)], ["rk", "rt", "v1", "v2"]
    )
    got = asof_join(left, right, "t", "rt", "k", "rk", how="left").orderBy("t").collect()
    # t=10 → rt=5 row: v1 stays NULL (not backfilled from nowhere);
    # t=20 → rt=15 row: v2 stays NULL (not taken from the rt=5 row).
    assert (got[0]["v1"], got[0]["v2"]) == (None, "a")
    assert (got[1]["v1"], got[1]["v2"]) == (99, None)


def test_asof_rejects_unknown_how(spark):
    import pytest as _pytest

    from nyc_landmarks_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame([(1, 5)], ["rk", "rt"])
    with _pytest.raises(ValueError):
        asof_join(left, right, "t", "rt", "k", "rk", how="full")
