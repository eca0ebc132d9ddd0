"""The bucketed layout must make the fact⋈fact join shuffle-free."""

from __future__ import annotations

from nyc_landmarks_datalake_spark.operators.bucketing import bucketed_pair


def test_bucketed_join_has_no_exchange(spark, sf_small):
    """With broadcast off, the bucketed join must be a SortMergeJoin
    with NO Exchange on either input — the entire point of paying the
    layout shuffle once at write time."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, li = bucketed_pair(spark, sf_small)
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_pair_reuses_layout(spark, sf_small):
    """Second call must resolve to the already-written catalog tables
    (no re-shuffle of the layout)."""
    a1, _ = bucketed_pair(spark, sf_small)
    a2, _ = bucketed_pair(spark, sf_small)
    assert a1.schema == a2.schema
    assert a1.count() == a2.count()


def test_partition_pruned_query_plan(spark, sf_small):
    """q_partition_pruned_agg's read must prune at planning time: the
    scan's PartitionFilters carries the day predicate."""
    import tempfile

    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.zorder import PRUNE_DAY
    from nyc_landmarks_datalake_spark.sources.catalog import table

    ev = table(spark, sf_small, "events").withColumn("event_day", F.to_date("ts"))
    path = tempfile.mkdtemp(prefix="prune_pin_") + "/data"
    ev.write.mode("overwrite").partitionBy("event_day").parquet(path)
    pruned = spark.read.parquet(path).filter(
        F.col("event_day") == F.lit(PRUNE_DAY).cast("date")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_day" in plan, plan
    days = {r["event_day"] for r in pruned.select("event_day").distinct().collect()}
    assert len(days) <= 1
