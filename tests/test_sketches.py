"""Accuracy bounds for the sketch aggregates.

Since round 6 the sketch queries are oracle-checked: they reduce the
engine-specific estimate to a within-documented-bound boolean evaluated
against the exact answer inside the same plan. These tests assert the
booleans hold and that the exact companions agree with an independent
recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.sources.catalog import table

registry.load_all()


def test_approx_distinct_within_rsd(spark, sf_oracle):
    rows = registry.QUERIES["q_approx_distinct"](spark, sf_oracle).collect()
    assert rows
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
    for row in rows:
        assert row["parts_within_bound"] is True
        assert row["orders_within_bound"] is True
        assert row["exact_parts"] == exact[row["l_returnflag"]]["parts"]
        assert row["exact_orders"] == exact[row["l_returnflag"]]["orders"]


def test_approx_percentile_rank_bound(spark, sf_oracle):
    rows = registry.QUERIES["q_approx_percentile"](spark, sf_oracle).collect()
    assert rows
    n_by_prio = {
        r["o_orderpriority"]: r["n"]
        for r in table(spark, sf_oracle, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for row in rows:
        assert row["median_rank_ok"] is True
        assert row["p95_rank_ok"] is True
        assert row["n_rows"] == n_by_prio[row["o_orderpriority"]]


def test_production_sketch_path_has_no_exact_companion(spark, sf_oracle):
    """The production (parity=False) plans aggregate ONLY sketch state:
    no countDistinct Expand node, no second pass over the input — the
    property that makes 100 TB distinct-counting map-side."""
    from nyc_landmarks_datalake_spark.operators.sketches import (
        approx_distinct_counts,
        approx_percentiles,
    )
    from nyc_landmarks_datalake_spark.sources.catalog import table

    li = table(spark, sf_oracle, "lineitem")
    prod = approx_distinct_counts(li, ["l_returnflag"], ["l_partkey"])
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "count(distinct" not in plan.lower()
    assert "Expand" not in plan
    assert prod.columns == ["l_returnflag", "approx_l_partkey"]

    orders = table(spark, sf_oracle, "orders")
    pcts = approx_percentiles(orders, ["o_orderpriority"], "o_totalprice")
    pplan = pcts._jdf.queryExecution().executedPlan().toString()
    # exactly one scan, no join back onto the input
    assert pplan.count("Scan parquet") + pplan.count("FileScan") <= 2
    assert "Join" not in pplan
    assert pcts.columns == ["o_orderpriority", "p50", "p95"]
