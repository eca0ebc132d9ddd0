"""Nested-type, pivot, percentile, and ordering operators — the rest of
the SURVEY §2.B scalar/structural surface.

Scale notes: explode multiplies rows map-side (no shuffle); pivot with an
explicit value list is a single hash-agg (never use inferred pivot values
at scale — that is an extra pass over 100 TB to discover categories);
exact percentiles require a sort per group — fine for bounded groups,
use approx_percentile for unbounded ones (covered in q_approx_stats,
rows-only check since HLL/t-digest internals differ per engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Array ops battery: split/explode/array_contains/slice/sort over text.
# ---------------------------------------------------------------------------
@query(
    "q_array_ops",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           CAST(len(toks) AS BIGINT) AS n_toks,
           array_to_string(list_sort(toks[1:3]), '|') AS first3_sorted,
           CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark,
           list_sort(list_distinct(toks))[1] AS min_tok
    FROM t
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.size(toks).cast("long").alias("n_toks"),
        F.concat_ws("|", F.array_sort(F.slice(toks, 1, 3))).alias("first3_sorted"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("min_tok"),
    )


# ---------------------------------------------------------------------------
# Map ops: build a map from aggregated pairs, read keys/values back.
# ---------------------------------------------------------------------------
@query(
    "q_map_ops",
    sql=f"""
    WITH agg AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS type_keys,
           CAST(len(list(event_type)) AS BIGINT) AS n_types,
           {dsum_sql('n')} AS total_events
    FROM agg
    GROUP BY user_id
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    agg = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # map_from_entries exercises MapType end-to-end; the comparable
    # projection is sorted keys + value sum (map iteration order is
    # engine-specific, so the map itself stays internal).
    with_map = agg.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return with_map.select(
        "user_id",
        F.concat_ws(",", F.array_sort(F.map_keys(F.col("m")))).alias("type_keys"),
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
        F.aggregate(
            F.map_values(F.col("m")), F.lit(0).cast("long"), lambda a, x: a + x
        )
        .cast("double")
        .alias("total_events"),
    )


# ---------------------------------------------------------------------------
# Pivot with explicit values (single hash-agg).
# ---------------------------------------------------------------------------
@query(
    "q_pivot_status",
    sql=f"""
    SELECT o_orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide per-status sums back to long (priority, status,
# total) — Spark's native unpivot operator (zero shuffle beyond the
# producing agg; the melt itself is a row-local Expand). Oracle is the
# engine-agnostic UNION ALL form, which like Spark's unpivot keeps
# NULL measures of absent (priority, status) combos.
# ---------------------------------------------------------------------------
@query(
    "q_unpivot_status",
    sql=f"""
    WITH wide AS (
        SELECT o_orderpriority,
               {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
               {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
               {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'F' AS status, F AS total FROM wide
    UNION ALL
    SELECT o_orderpriority, 'O' AS status, O AS total FROM wide
    UNION ALL
    SELECT o_orderpriority, 'P' AS status, P AS total FROM wide
    """,
)
def q_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_pivot_status(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="total",
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median (deterministic interpolation both engines).
# ---------------------------------------------------------------------------
@query(
    "q_percentiles",
    sql="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.5) AS median_bal,
           quantile_cont(c_acctbal, 0.9) AS p90_bal,
           quantile_cont(c_acctbal, 0.25) AS p25_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
        F.expr("percentile(c_acctbal, 0.9)").alias("p90_bal"),
        F.expr("percentile(c_acctbal, 0.25)").alias("p25_bal"),
    )


# ---------------------------------------------------------------------------
# Global sort + limit (range-partitioned TakeOrdered).
# ---------------------------------------------------------------------------
@query(
    "q_global_topn",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# GROUPING SETS through the SQL surface (spark.sql, not DataFrame).
# ---------------------------------------------------------------------------
@query(
    "q_grouping_sets",
    sql=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           {dsum_sql('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                   AS total_price
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# IN / NOT IN subqueries through the SQL surface.
# ---------------------------------------------------------------------------
@query(
    "q_in_subquery",
    sql="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    )
    AND p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 49
    )
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "part").createOrReplaceTempView("sq_part")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM sq_part
        WHERE p_partkey IN (
            SELECT l_partkey FROM sq_lineitem WHERE l_quantity > 45
        )
        AND p_partkey NOT IN (
            SELECT l_partkey FROM sq_lineitem
            WHERE l_returnflag = 'R' AND l_quantity > 49
        )
        """
    )


# ---------------------------------------------------------------------------
# Array set-operations battery: union/intersect/except/overlap between
# each document's token set and a fixed probe vocabulary — all
# map-side higher-order array functions (the building blocks the dedup
# tier composes). Sorted outputs make the arrays order-stable across
# engines.
# ---------------------------------------------------------------------------
_PROBE_VOCAB = ("table", "scan", "merge", "window")
_PROBE_SQL = "[" + ", ".join(f"'{t}'" for t in _PROBE_VOCAB) + "]"


@query(
    "q_array_setops",
    sql=f"""
    SELECT doc_id,
           COALESCE(array_to_string(
               list_sort(list_distinct(list_intersect(toks, {_PROBE_SQL}))), ','
           ), '') AS common_toks,
           len(list_distinct(list_concat(toks, {_PROBE_SQL}))) AS union_size,
           len(list_filter(list_distinct(toks),
                           t -> NOT list_contains({_PROBE_SQL}, t)))
               AS n_only_doc,
           list_has_any(toks, {_PROBE_SQL}) AS overlaps
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    probe = F.array(*[F.lit(t) for t in _PROBE_VOCAB])
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        # coalesce matches the oracle's: NULL text yields '' on both sides
        F.coalesce(
            F.array_join(
                F.array_sort(F.array_distinct(F.array_intersect(toks, probe))), ","
            ),
            F.lit(""),
        ).alias("common_toks"),
        F.size(F.array_union(toks, probe)).alias("union_size"),
        F.size(F.array_except(F.array_distinct(toks), probe)).alias("n_only_doc"),
        F.arrays_overlap(toks, probe).alias("overlaps"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): a calendar month spine from
# fixed anchors, left-joined against per-month order counts so months
# with zero orders surface as 0 — the classic no-gaps reporting spine,
# run through spark.sql to exercise the SQL surface itself. The
# recursion is driver-cheap (79 spine rows); the corpus side is one
# hash agg, and the spine join broadcasts. Oracle is the identical
# recursion in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "q_recursive_month_spine",
    sql="""
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE m < DATE '2001-07-01'
    ),
    per_month AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT CAST(months.m AS VARCHAR) AS month_start,
           CAST(COALESCE(per_month.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN per_month ON per_month.m = months.m
    """,
)
def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("rec_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
            WHERE m < DATE '2001-07-01'
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n
            FROM rec_orders GROUP BY 1
        )
        SELECT CAST(months.m AS STRING) AS month_start,
               CAST(COALESCE(per_month.n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN per_month ON per_month.m = months.m
        """
    )
