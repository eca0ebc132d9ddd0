"""Dual-API parity: the engine's surface is equally reachable through
``spark.sql`` over registered views (SURVEY §4.2 note 3). Each case runs
a Spark-dialect SQL string and must produce exactly the rows of the
DataFrame-API twin from the registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.sources.catalog import register_views

registry.load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_groupby_matches_dataframe(spark, sf_small):
    register_views(spark, sf_small)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    want = registry.QUERIES["q01_pricing_summary"](spark, sf_small).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert _rows(got) == _rows(want)


def test_sql_window_matches_dataframe(spark, sf_small):
    register_views(spark, sf_small)
    got = spark.sql(
        """
        SELECT o_orderkey, o_orderpriority,
               cume_dist() OVER w AS cd,
               percent_rank() OVER w AS pr,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-02-01 00:00:00'
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        """
    )
    want = registry.QUERIES["q_window_distribution"](spark, sf_small)
    assert _rows(got) == _rows(want)


def test_sql_exists_subquery(spark, sf_small):
    register_views(spark, sf_small)
    got = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )
    want = registry.QUERIES["q04_order_priority"](spark, sf_small)
    assert _rows(got) == _rows(want)


def test_sql_higher_order_functions(spark, sf_small):
    # minhash-style transform/aggregate chain straight from SQL
    register_views(spark, sf_small)
    got = spark.sql(
        """
        SELECT doc_id,
               aggregate(transform(split(text, ' '), w -> length(w)),
                         0L, (acc, x) -> acc + x) AS total_chars_in_tokens
        FROM documents
        """
    )
    want = spark.table("documents").select(
        "doc_id",
        F.aggregate(
            F.transform(F.split("text", " "), lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ).alias("total_chars_in_tokens"),
    )
    assert _rows(got) == _rows(want)
