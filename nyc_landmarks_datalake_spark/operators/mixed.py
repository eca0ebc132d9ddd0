"""Composite analytics patterns: aggregate-then-join-back (TPC-H Q18
flavor), window-over-aggregate (share-of-total), three-valued-logic
null semantics, and the extended string-function lexicon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Q18 flavor: large-volume orders — HAVING over a fact agg, joined back
# to dimensions.
# ---------------------------------------------------------------------------
@query(
    "q18_large_volume_orders",
    sql=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Share-of-total: window over an aggregate (two-level computation).
# ---------------------------------------------------------------------------
@query(
    "q_revenue_share",
    sql=f"""
    WITH per_nation AS (
        SELECT n_name, {dsum_sql('c_acctbal')} AS nation_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, nation_bal,
           nation_bal / CAST(SUM(CAST(nation_bal AS DECIMAL(30,6))) OVER () AS DOUBLE)
               AS share,
           CAST(rank() OVER (ORDER BY nation_bal DESC, n_name) AS BIGINT) AS bal_rank
    FROM per_nation
    """,
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("c_acctbal")).alias("nation_bal"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("nation_bal"), F.asc("n_name"))
    return per_nation.select(
        "n_name",
        "nation_bal",
        (
            F.col("nation_bal")
            / F.sum(F.col("nation_bal").cast("decimal(30,6)"))
            .over(w_all)
            .cast("double")
        ).alias("share"),
        F.rank().over(w_rank).cast("long").alias("bal_rank"),
    )


# ---------------------------------------------------------------------------
# Null semantics: three-valued logic, null-safe equality, coalesce/nullif.
# Nulls are manufactured via a left join (customers without orders).
# ---------------------------------------------------------------------------
@query(
    "q_null_semantics",
    sql="""
    WITH lastord AS (
        SELECT o_custkey, MAX(o_orderdate) AS last_order
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           CASE WHEN last_order IS NULL THEN 1 ELSE 0 END AS is_null_flag,
           COALESCE(CAST(year(last_order) AS BIGINT), -1) AS last_year,
           CASE WHEN last_order IS NOT DISTINCT FROM NULL THEN 'never'
                ELSE 'ordered' END AS status,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer
    LEFT JOIN lastord ON c_custkey = o_custkey
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    lastord = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    j = cust.join(lastord, cust.c_custkey == lastord.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.when(F.col("last_order").isNull(), 1).otherwise(0).alias("is_null_flag"),
        F.coalesce(F.year("last_order").cast("long"), F.lit(-1)).alias("last_year"),
        F.when(F.col("last_order").eqNullSafe(F.lit(None)), "never")
        .otherwise("ordered")
        .alias("status"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
    )


# ---------------------------------------------------------------------------
# Extended string lexicon: translate/lpad/rpad/left/right/repeat/reverse/
# split_part/position.
# ---------------------------------------------------------------------------
@query(
    "q_string_funcs2",
    sql="""
    SELECT p_partkey,
           translate(p_brand, '#0123456789', '_NNNNNNNNNN') AS brand_masked,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_brand, 12, '.') AS brand_padded,
           left(p_name, 5) AS name_left,
           right(p_name, 3) AS name_right,
           repeat('*', p_size % 5) AS stars,
           reverse(p_brand) AS brand_rev,
           split_part(p_type, ' ', 1) AS type_first,
           CAST(position(' ' IN p_name) AS BIGINT) AS first_space
    FROM part
    WHERE p_size BETWEEN 10 AND 30
    """,
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_size").between(10, 30)).select(
        "p_partkey",
        F.translate("p_brand", "#0123456789", "_NNNNNNNNNN").alias("brand_masked"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_padded"),
        F.substring("p_name", 1, 5).alias("name_left"),
        F.expr("right(p_name, 3)").alias("name_right"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
        F.instr(F.col("p_name"), " ").cast("long").alias("first_space"),
    )
