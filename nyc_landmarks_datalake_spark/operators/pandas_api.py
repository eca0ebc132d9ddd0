"""pandas API on Spark (pyspark.pandas) — the drop-in pandas dialect
over the same engine. One registered query routes a grouped aggregate
through the ps.DataFrame surface and back via to_spark(), proving the
layer plans into ordinary Catalyst aggregation (same oracle as a plain
GROUP BY — integer-exact, so the API shim cannot hide value drift).

Scale note: pandas-on-Spark defaults to a distributed-sequence index
which adds a zipWithIndex-style pass; the query avoids materializing
any index (groupby(as_index=False) → to_spark()) so the plan is the
plain hash aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


@query(
    "q_pandas_api_agg",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pandas_api_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals per return flag through pyspark.pandas."""
    import pyspark.pandas as ps  # noqa: F401  (import registers the API)

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    psdf = li.pandas_api()
    grouped = psdf.groupby("l_returnflag", as_index=False).agg(
        total_qty=("q", "sum"), n=("q", "count")
    )
    out = grouped.to_spark()
    return out.select(
        "l_returnflag",
        F.col("total_qty").cast("long").alias("total_qty"),
        F.col("n").cast("long").alias("n"),
    )
