"""Bucketed tables — the co-located (shuffle-free) join layout.

A big⋈big equi-join normally shuffles BOTH sides on the key every time
it runs. Writing each side once as a bucketed table (``bucketBy(n,
key).sortBy(key)``) pre-partitions the data by ``hash(key) % n`` at
rest, so every subsequent join on that key reads matching buckets
pairwise: no exchange on either side, ever again. At 100 TB this turns
the recurring cost of the pipeline's hottest join (fact⋈fact on
orderkey) from two full-table shuffles per run into zero — the shuffle
is paid once, at layout time, like z-ordering pays the sort once.

The registered query performs the real thing end to end inside the
callable: bucket-write orders and lineitem (16 buckets each on the
join key) into a session-scoped warehouse path, re-read them as
catalog tables, join, and aggregate. ``tests/test_bucketing.py`` pins
the property that justifies the layout: with broadcast disabled the
joined plan contains a SortMergeJoin and NO Exchange on either side.
The oracle is the identical join+aggregate straight off the raw
parquet — bucketing must never change results, only movement.
"""

from __future__ import annotations

import hashlib
import os

from nyc_landmarks_datalake_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

N_BUCKETS = 16


def bucketed_write(
    df: DataFrame, name: str, key: str, path: str, n_buckets: int = N_BUCKETS
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table at ``path``."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Orders and lineitem as bucketed tables (written once per sf_dir).

    Table names are keyed by sf_dir so repeated calls in one session
    reuse the layout instead of re-shuffling — which is the point.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
    if not all(spark.catalog.tableExists(n) for n in names):
        base = scratch_dir(prefix=f"bucketed_{tag}_")
        bucketed_write(
            table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            names[0],
            "o_orderkey",
            os.path.join(base, "orders"),
        )
        bucketed_write(
            table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_quantity"
            ),
            names[1],
            "l_orderkey",
            os.path.join(base, "lineitem"),
        )
    return spark.table(names[0]), spark.table(names[1])


@query(
    "q_bucketed_join",
    sql=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {dsum_sql('l.l_extendedprice')} AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact⋈fact join run over the bucketed layout (results must equal
    the raw-parquet join — bucketing changes movement, not values)."""
    orders, li = bucketed_pair(spark, sf_dir)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("revenue"),
        )
    )
