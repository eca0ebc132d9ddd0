"""Approximate/sketch aggregates: HLL++ distinct counts and GK-sketch
approximate percentiles — with oracle-checkable accuracy flags.

Sketch internals (and hence the raw approximations) differ per engine,
so the raw estimates can never hash-match a DuckDB oracle. Instead each
query emits only hash-safe columns (group key, exact counts, booleans):
the approximation is evaluated AGAINST THE EXACT ANSWER inside the same
Spark plan and reduced to a within-documented-bound boolean; the DuckDB
oracle computes the same exact answer and asserts the boolean is TRUE.
A Spark estimate drifting outside its bound therefore turns the driver
row red — a real independent accuracy check, not rows-only. Raw
estimates remain covered by tests/test_sketches.py.

Scale: the exact side rides along ONLY to make the sketch checkable at
test scale; the production path is the sketch alone — exact distinct
counts shuffle every distinct value, while HLL++ partial-aggregates a
fixed ~1.5 KB sketch per group, making 100 TB distinct-counting a
map-side problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

#: HLL++ relative standard deviation requested; the check allows 3x
#: (three-sigma) drift before declaring the sketch broken.
HLL_RSD = 0.02
HLL_TOL = 3 * HLL_RSD

#: GK percentile accuracy parameter (rank error <= 1/accuracy); the
#: check allows 2% rank drift — orders of magnitude above the guarantee,
#: tight enough to catch a broken sketch.
PCT_ACCURACY = 1000
PCT_RANK_TOL = 0.02


@query(
    "q_approx_distinct",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS parts_within_bound,
           TRUE AS orders_within_bound
    FROM lineitem GROUP BY 1
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=HLL_RSD).alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )

    def within(approx: str, exact: str):
        rel = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return rel <= F.lit(HLL_TOL)

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        "n_rows",
        within("approx_parts", "exact_parts").alias("parts_within_bound"),
        within("approx_orders", "exact_orders").alias("orders_within_bound"),
    )


@query(
    "q_approx_percentile",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS median_rank_ok,
           TRUE AS p95_rank_ok
    FROM orders GROUP BY 1
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95 per priority, checked by RANK: the fraction of
    rows <= the sketch's answer must sit within PCT_RANK_TOL of the
    requested quantile — the actual Greenwald-Khanna guarantee, stated
    without comparing engine-specific sketch values. The 5-row approx
    frame broadcasts back onto orders; one extra pass at test scale."""
    orders = table(spark, sf_dir, "orders")
    approx = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, PCT_ACCURACY).alias("a50"),
        F.percentile_approx("o_totalprice", 0.95, PCT_ACCURACY).alias("a95"),
    )
    joined = orders.join(F.broadcast(approx), "o_orderpriority")
    ranked = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("a50"), 1).otherwise(0)
            )
            / F.count(F.lit(1))
        ).alias("r50"),
        (
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("a95"), 1).otherwise(0)
            )
            / F.count(F.lit(1))
        ).alias("r95"),
    )
    return ranked.select(
        "o_orderpriority",
        "n_rows",
        (F.abs(F.col("r50") - 0.5) <= PCT_RANK_TOL).alias("median_rank_ok"),
        (F.abs(F.col("r95") - 0.95) <= PCT_RANK_TOL).alias("p95_rank_ok"),
    )
