from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.ingest.csv_ingest import (
    normalize_key_col,
    normalize_object_key,
)
from nyc_landmarks_datalake_spark.plans.observe import job_group, observed
from nyc_landmarks_datalake_spark.sources.catalog import table


def test_observed_metrics_ride_along(spark, sf_small):
    li = table(spark, sf_small, "lineitem")
    df, obs = observed(
        li.filter(F.col("l_quantity") > 10),
        "ingest_metrics",
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_quantity").alias("qty"),
        F.min("l_shipdate").alias("first_ship"),
    )
    n = df.count()
    got = obs.get
    assert got["rows"] == n
    assert got["qty"] > 0 and got["first_ship"] is not None


def test_job_group_scoping(spark, sf_small):
    with job_group(spark, "bronze-to-silver", "landmarks ingest"):
        assert table(spark, sf_small, "region").count() == 5
    # group cleared after the block
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") in ("", None)


def test_normalize_object_key():
    assert normalize_object_key("raw/my+file%20name.csv") == "raw/my file name.csv"
    assert normalize_object_key("plain.csv") == "plain.csv"


def test_normalize_key_col(spark):
    df = spark.createDataFrame([("raw/my+file%20name.csv",)], ["k"])
    got = df.select(normalize_key_col(F.col("k")).alias("k")).collect()[0]["k"]
    assert got == "raw/my file name.csv"
