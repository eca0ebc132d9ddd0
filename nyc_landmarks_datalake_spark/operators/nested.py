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


# ---------------------------------------------------------------------------
# EXACT order statistics WITHOUT buffering a group's values: the
# two-pass bucketed quantile. Spark's `percentile` aggregate (used by
# q_percentiles for deterministic interpolation) buffers every value of
# a group in executor memory — fine for many small groups, fatal for
# one 100 TB group. The scale pattern instead: pass A histograms each
# group into B buckets (one map-side-combined hash agg) and walks the
# tiny cumulative histogram to find, for each requested quantile, the
# bucket holding the k-th smallest element (k = ceil(n*q), the
# percentile_disc rank — integer-exact in ppm) and the residual rank
# within it; pass B re-scans ONLY the target buckets (a broadcast
# semi-join; ~n/B rows per group) and picks the exact element by
# row_number. No group ever materializes; both passes are ordinary
# shuffles. The quantiles are actual data values, so parity with
# DuckDB's quantile_disc is bit-exact.
# ---------------------------------------------------------------------------
_EQ_B = 1024  # histogram buckets per group
_EQ_QS = (250_000, 500_000, 900_000)  # quantiles in ppm


@query(
    "q_exact_quantiles_bucketed",
    sql=f"""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n_rows,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def q_exact_quantiles_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from nyc_landmarks_datalake_spark.sources.catalog import table as _table

    ev = (
        _table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    # bucket width; a constant-valued group degenerates to bucket 0
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "value",
        F.least(
            F.lit(_EQ_B - 1),
            F.when(
                F.col("vmax") > F.col("vmin"),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * _EQ_B
                    / (F.col("vmax") - F.col("vmin"))
                ),
            ).otherwise(F.lit(0)),
        )
        .cast("int")
        .alias("bucket"),
    )
    hist = binned.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "event_type", "bucket", "bn", F.sum("bn").over(w).alias("cum")
    ).join(F.broadcast(stats.select("event_type", "n")), "event_type")
    # one spec row per (group, quantile): target bucket + residual rank
    specs = None
    for q_ppm in _EQ_QS:
        k = F.expr(f"CAST((n * {q_ppm} + 999999) div 1000000 AS BIGINT)")
        s = (
            cum.withColumn("k", k)
            .filter(F.col("cum") >= F.col("k"))
            .groupBy("event_type")
            .agg(
                F.min("bucket").alias("tbucket"),
                F.first(F.col("k")).alias("k"),
            )
            .join(
                cum.select(
                    "event_type",
                    F.col("bucket").alias("tbucket"),
                    (F.col("cum") - F.col("bn")).alias("cum_before"),
                ),
                ["event_type", "tbucket"],
            )
            .select(
                "event_type",
                F.lit(q_ppm).alias("q_ppm"),
                "tbucket",
                (F.col("k") - F.col("cum_before")).alias("offset"),
            )
        )
        specs = s if specs is None else specs.unionByName(s)
    # pass B: only the target buckets' rows survive the broadcast join
    # (spec columns renamed — specs derives from binned, so shared names
    # would be an ambiguous self-join)
    spec_cols = specs.select(
        F.col("event_type").alias("s_et"),
        F.col("tbucket").alias("s_bucket"),
        "q_ppm",
        "offset",
    )
    hit = binned.join(
        F.broadcast(spec_cols),
        (F.col("event_type") == F.col("s_et"))
        & (F.col("bucket") == F.col("s_bucket")),
    ).select("event_type", "value", "q_ppm", "offset")
    rw = Window.partitionBy("event_type", "q_ppm").orderBy("value")
    picked = (
        hit.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == F.col("offset"))
        .select("event_type", "q_ppm", "value")
    )
    return (
        picked.groupBy("event_type")
        .agg(
            F.max(F.when(F.col("q_ppm") == 250_000, F.col("value"))).alias(
                "p25"
            ),
            F.max(F.when(F.col("q_ppm") == 500_000, F.col("value"))).alias(
                "p50"
            ),
            F.max(F.when(F.col("q_ppm") == 900_000, F.col("value"))).alias(
                "p90"
            ),
        )
        .join(F.broadcast(stats.select("event_type", F.col("n").alias("n_rows"))), "event_type")
        .select("event_type", F.col("n_rows").cast("long"), "p25", "p50", "p90")
    )
