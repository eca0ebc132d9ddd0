"""Observability — the Spark-native equivalent of the reference's X-Ray
subsegments (R15, CSVIngest.java:104-111, :240-251): named metrics
attached to the dataflow itself, collected exactly once per action.

``observed()`` wraps a DataFrame with a named Observation computing
row counts / sums / min-max inline (zero extra passes — the metrics
ride along with whatever action executes the frame). ``job_group``
scopes Spark UI/job-server attribution the way X-Ray scoped traces.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Observation, SparkSession


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach an Observation; read ``obs.get`` AFTER an action runs."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


@contextmanager
def job_group(spark: SparkSession, group: str, description: str):
    """Scope all jobs in the block under a UI-visible group (the
    tracing-span equivalent; exceptions propagate unchanged)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, description, interruptOnCancel=False)
    try:
        yield
    finally:
        sc.setJobGroup("", "")
