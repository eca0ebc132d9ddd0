"""Accuracy bounds for the sketch aggregates (which have no DuckDB
oracle — registry.ROWS_ONLY documents why)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.sources.catalog import table

registry.load_all()


def test_approx_distinct_within_rsd(spark, sf_oracle):
    approx = {
        r["l_returnflag"]: r
        for r in registry.QUERIES["q_approx_distinct"](spark, sf_oracle).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in table(spark, sf_oracle, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    for flag, row in approx.items():
        # rsd=0.02 → allow 5 sigma
        assert abs(row["approx_parts"] - exact[flag]["parts"]) <= 0.1 * exact[flag]["parts"]
        assert abs(row["approx_orders"] - exact[flag]["orders"]) <= 0.1 * exact[flag]["orders"]


def test_approx_percentile_tolerance(spark, sf_oracle):
    approx = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["q_approx_percentile"](spark, sf_oracle).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in table(spark, sf_oracle, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for prio, row in approx.items():
        assert abs(row["approx_median"] - exact[prio]["median"]) / exact[prio]["median"] < 0.05
        assert abs(row["approx_p95"] - exact[prio]["p95"]) / exact[prio]["p95"] < 0.05
