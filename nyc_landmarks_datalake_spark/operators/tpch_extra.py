"""TPC-H-flavored optimizer workouts adapted to this schema (there is no
partsupp/shipmode table; part↔supplier relations derive from lineitem):
min-per-group join-back (Q2), nation-pair volume (Q7), scalar-subquery
thresholds (Q11), conditional share (Q14), disjunctive predicate pushdown
(Q19), and above-average-never-ordered (Q22).

These exist to exercise Catalyst paths the simpler corpus doesn't:
correlated→join decorrelation, disjunction pushdown, scalar subqueries
feeding HAVING, and self-joins over derived relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Q2 flavor: per part, the supplier(s) with the minimum average sale
# price (min-per-group then join back on the min).
# ---------------------------------------------------------------------------
@query(
    "q02_min_cost_supplier",
    sql=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, {davg_sql('l_extendedprice')} AS avg_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    m AS (SELECT l_partkey AS mk, MIN(avg_price) AS min_price FROM ps GROUP BY 1)
    SELECT p_partkey, p_brand, s_name, ps.avg_price AS best_price
    FROM ps
    JOIN m ON ps.l_partkey = m.mk AND ps.avg_price = m.min_price
    JOIN part ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    WHERE p_size > 40
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    supp = table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        davg(F.col("l_extendedprice")).alias("avg_price")
    )
    m = ps.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("avg_price").alias("min_price")
    )
    return (
        ps.join(m, (ps.l_partkey == m.mk) & (ps.avg_price == m.min_price))
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", F.col("avg_price").alias("best_price"))
    )


# ---------------------------------------------------------------------------
# Q7 flavor: cross-nation trade volume by year (supplier nation ≠
# customer nation), both directions kept.
# ---------------------------------------------------------------------------
@query(
    "q07_volume_shipping",
    sql=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


# ---------------------------------------------------------------------------
# Q11 flavor: parts whose total sales value exceeds a global-fraction
# threshold (scalar subquery in HAVING).
# ---------------------------------------------------------------------------
@query(
    "q11_important_parts",
    sql=f"""
    WITH pv AS (
        SELECT l_partkey, {dsum_sql('l_extendedprice * l_quantity')} AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, part_value
    FROM pv
    WHERE part_value > (
        SELECT 0.002 * CAST(SUM(CAST(part_value AS DECIMAL(30,6))) AS DOUBLE) FROM pv
    )
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
    )
    total = pv.agg(
        F.sum(F.col("part_value").cast("decimal(30,6)")).cast("double").alias("t")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.002 * F.col("t"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


# ---------------------------------------------------------------------------
# Q14 flavor: promo revenue share within a month (conditional agg ratio).
# ---------------------------------------------------------------------------
@query(
    "q14_promo_share",
    sql=f"""
    SELECT 100.0 * {dsum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
               / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (100.0 * dsum(promo) / dsum(rev)).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 flavor: disjunction of conjunctive (brand, size, qty) envelopes —
# pushdown/CNF handling.
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive",
    sql=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 5 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 10 AND l_quantity <= 50)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    def env(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )
    cond = env("Brand#1", 1, 15, 1, 20) | env("Brand#2", 10, 30, 5, 35) | env(
        "Brand#3", 20, 50, 10, 50
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Q22 flavor: above-average-balance customers who never ordered, grouped
# by a synthetic "country code" (scalar subquery + anti join).
# ---------------------------------------------------------------------------
@query(
    "q22_sales_opportunity",
    sql=f"""
    WITH avg_bal AS (
        SELECT {davg_sql('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_custkey % 10 AS BIGINT) AS cc,
           COUNT(*) AS n_custs,
           {dsum_sql('c_acctbal')} AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("long").alias("cc"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )
