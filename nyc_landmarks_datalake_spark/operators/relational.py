"""Core relational operator surface: scans, filters, projections, joins
(inner/semi/anti, broadcast), hash aggregation, rollup/cube, set ops,
scalar string/date/math functions.

The reference implements NONE of this (its only predicate is a
header-vs-schema compare, CSVIngest.java:161-172; its only "projection"
is the per-line geometry massage, :60-86) — this module is the analytics
tier the reference's lake delegates to downstream tooling (SURVEY §0).

Scale notes (100 TB): every query here is declarative DataFrame code —
Catalyst handles predicate pushdown into parquet scans, column pruning,
and join selection. Dimension tables (region/nation, fixed cardinality)
are explicitly broadcast so the fact-table side never shuffles for
those joins; AQE handles skew and coalesces post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import (
    davg,
    davg_sql,
    dcorr,
    dcorr_sql,
    dstddev,
    dstddev_sql,
    dsum,
    dsum_sql,
)
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# q01: TPC-H Q1 style pricing summary — filter + hash agg + sort.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q03: shipping priority — 3-way join + agg + deterministic top-10.
# ---------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    sql=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q05: local supplier volume — 6-way join incl. broadcast dims.
# ---------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    sql=f"""
    SELECT n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q06: forecast revenue — pushdown-friendly filter + single agg.
# ---------------------------------------------------------------------------
@query(
    "q06_revenue_forecast",
    sql=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q10: returned items — join + agg + deterministic top-20.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# conditional aggregation (CASE WHEN pivot over order status).
# ---------------------------------------------------------------------------
@query(
    "q_conditional_agg",
    sql=f"""
    SELECT o_orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_total,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS open_total,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS pending_total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def bucket(status: str):
        return F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)

    return orders.groupBy("o_orderpriority").agg(
        dsum(bucket("F")).alias("finished_total"),
        dsum(bucket("O")).alias("open_total"),
        dsum(bucket("P")).alias("pending_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# HAVING over grouped counts.
# ---------------------------------------------------------------------------
@query(
    "q_having_nations",
    sql="""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 40
    """,
)
def q_having_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .filter(F.col("n_customers") > 40)
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 flavor) — decorrelated to a join.
# ---------------------------------------------------------------------------
@query(
    "q_correlated_avg_qty",
    sql=f"""
    SELECT p_brand,
           {dsum_sql('l_extendedprice')} AS small_order_value,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
    )
    GROUP BY p_brand
    """,
)
def q_correlated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # Decorrelated: per-part average as a broadcastable agg, joined back.
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.ap_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice")).alias("small_order_value"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Anti join: customers with no orders.
# ---------------------------------------------------------------------------
@query(
    "q_anti_join_no_orders",
    sql="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


# ---------------------------------------------------------------------------
# Semi join: suppliers in nations that have a >9000-acctbal customer.
# ---------------------------------------------------------------------------
@query(
    "q_semi_join_suppliers",
    sql="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM customer
        WHERE c_nationkey = s_nationkey AND c_acctbal > 9000
    )
    """,
)
def q_semi_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return supp.join(
        F.broadcast(rich), supp.s_nationkey == rich.c_nationkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT with a tag column.
# ---------------------------------------------------------------------------
@query(
    "q_setops_segments",
    sql="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'building_buyer' AS tag, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM buyers)
    UNION ALL
    SELECT 'building_no_order' AS tag, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM buyers)
    UNION ALL
    SELECT 'any_buyer' AS tag, c_custkey FROM buyers
    """,
)
def q_setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    both = building.intersect(buyers).select(F.lit("building_buyer").alias("tag"), "c_custkey")
    only_b = building.exceptAll(buyers).distinct().select(
        F.lit("building_no_order").alias("tag"), "c_custkey"
    )
    any_b = buyers.select(F.lit("any_buyer").alias("tag"), "c_custkey")
    return both.unionByName(only_b).unionByName(any_b)


# ---------------------------------------------------------------------------
# DISTINCT aggregation.
# ---------------------------------------------------------------------------
@query(
    "q_distinct_counts",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# ROLLUP with grouping flags.
# ---------------------------------------------------------------------------
@query(
    "q_rollup_revenue",
    sql=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(GROUPING(r_name) AS BIGINT) AS g_region,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           {dsum_sql('c_acctbal')} AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("long").alias("g_region"),
            F.grouping("n_name").cast("long").alias("g_nation"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "g_region",
            "g_nation",
            "total_acctbal",
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# CUBE over lineitem flags.
# ---------------------------------------------------------------------------
@query(
    "q_cube_flags",
    sql=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           {dsum_sql('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# String function battery (the reference's entire string surface —
# regexp_replace / trim / split / substring / case — CSVIngest.java:65-81,
# :152, :222-224 — plus the rest of the standard lexicon).
# ---------------------------------------------------------------------------
@query(
    "q_string_funcs",
    sql="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 4) AS type_prefix,
           concat_ws('-', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           regexp_replace(p_brand, '[0-9]+', '#') AS brand_norm,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(instr(p_type, 'O') AS BIGINT) AS o_pos,
           trim(concat('  ', p_brand, '  ')) AS brand_trim
    FROM part
    WHERE p_type LIKE 'PROMO%' OR p_type LIKE '%ECO%'
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("PROMO%") | F.col("p_type").like("%ECO%")
    ).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_norm"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.instr(F.col("p_type"), "O").cast("long").alias("o_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    )


# ---------------------------------------------------------------------------
# Date/time function battery.
# ---------------------------------------------------------------------------
@query(
    "q_date_funcs",
    sql=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           date_trunc('month', o_orderdate) AS month_start,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS month_total,
           CAST(MAX(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)) AS BIGINT) AS max_days_since_epoch,
           CAST(MIN(dayofweek(o_orderdate) + 1) AS BIGINT) AS min_dow
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("month_total"),
            F.max(F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")))
            .cast("long")
            .alias("max_days_since_epoch"),
            F.min(F.dayofweek("o_orderdate")).cast("long").alias("min_dow"),
        )
    )


# ---------------------------------------------------------------------------
# Math/statistics battery — deterministic derivations from exact sums.
# ---------------------------------------------------------------------------
@query(
    "q_math_stats",
    sql=f"""
    SELECT c_mktsegment,
           {davg_sql('c_acctbal')} AS avg_bal,
           {dstddev_sql('c_acctbal')} AS std_bal,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           {dsum_sql('abs(c_acctbal)')} AS sum_abs,
           {dsum_sql('round(c_acctbal, 0)')} AS sum_rounded,
           {dcorr_sql('c_acctbal', 'CAST(c_custkey AS DOUBLE)')} AS bal_key_corr,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_math_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    key_d = F.col("c_custkey").cast("double")
    return cust.groupBy("c_mktsegment").agg(
        davg(bal).alias("avg_bal"),
        dstddev(bal).alias("std_bal"),
        F.min(bal).cast("double").alias("min_bal"),
        F.max(bal).cast("double").alias("max_bal"),
        dsum(F.abs(bal)).alias("sum_abs"),
        dsum(F.round(bal, 0)).alias("sum_rounded"),
        dcorr(bal, key_d).alias("bal_key_corr"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# unionByName with missing columns: the schema-drift-tolerant append a
# silver tier needs when writers evolve independently (nulls backfill
# the absent columns on each side).
# ---------------------------------------------------------------------------
@query(
    "q_union_by_name",
    sql="""
    SELECT c_custkey AS entity_id, c_acctbal AS balance,
           c_mktsegment AS segment, NULL AS priority
    FROM customer WHERE c_custkey % 100 = 0
    UNION ALL BY NAME
    SELECT o_orderkey AS entity_id, o_totalprice AS balance,
           NULL AS segment, o_orderpriority AS priority
    FROM orders WHERE o_orderkey % 1000 = 0
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 0)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            F.col("o_orderkey").alias("entity_id"),
            F.col("o_totalprice").alias("balance"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return cust.unionByName(orders, allowMissingColumns=True)
