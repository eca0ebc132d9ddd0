"""Table catalog over a scale-factor directory of parquet files.

The reference keeps its "catalog" as S3 object tags pointing at sidecar
schema files (CSVIngest.java:88-100, :232-234). Here the analytics-zone
catalog is simply parquet-with-embedded-schema per table; the sidecar
machinery lives in :mod:`nyc_landmarks_datalake_spark.schema.sidecar`
and is used by the ingest tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# is 5 rows, nation 25 — fixed size regardless of sf). customer/supplier
# grow with sf but stay broadcastable to ~sf100; Catalyst's size-based
# threshold decides beyond that.
BROADCAST_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long and truncate to microseconds (the
    same truncation DuckDB applies when casting ns→µs timestamps)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
