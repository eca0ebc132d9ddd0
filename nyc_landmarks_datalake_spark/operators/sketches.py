"""Approximate/sketch aggregates: HLL++ distinct counts and t-digest-ish
approximate percentiles.

These have NO DuckDB oracle on purpose: sketch internals (and hence the
approximations) differ per engine, so the driver records the weaker
rows-only check (registry.ROWS_ONLY carries the reason). Accuracy is
instead asserted in tests/test_sketches.py against the exact values with
the documented error bounds (HLL++ rsd, percentile tolerance).

Scale: this is the point — exact distinct counts shuffle every distinct
value; HLL++ partial-aggregates a fixed ~1.5 KB sketch per group, making
100 TB distinct-counting a map-side problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query, rows_only
from nyc_landmarks_datalake_spark.sources.catalog import table


@query("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


rows_only(
    "q_approx_distinct",
    "HLL++ sketch estimates are engine-specific; accuracy bounds are "
    "asserted against exact counts in tests/test_sketches.py",
)


@query("q_approx_percentile")
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.95, 1000).alias("approx_p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )


rows_only(
    "q_approx_percentile",
    "approximate-percentile sketches are engine-specific; tolerance vs "
    "exact percentiles is asserted in tests/test_sketches.py",
)
