"""Window-function surface: ranking, running totals, lag/lead, ntile,
percent_rank, and range-framed windows.

ABSENT from the reference (SURVEY §2.B) — standard analytics-tier ops.

Scale notes: window partitions shuffle once on the partition key; frames
evaluate within sorted partitions with no extra shuffle. Skewed partition
keys (a single hot user) are the risk at 100 TB — key choices here
(custkey, user_id) are high-cardinality/uniform in this schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Top-k per group via row_number (the scalable top-k idiom).
# ---------------------------------------------------------------------------
@query(
    "q_topk_per_group",
    sql="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rk
        FROM customer
    )
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rk")
    )


# ---------------------------------------------------------------------------
# Running total per customer (rows-framed cumulative sum).
# Cumulative sums are order-dependent float chains, but within one
# partition both engines accumulate in the same ORDER BY order over
# identical doubles — still, we go through decimal for bit-stability.
# ---------------------------------------------------------------------------
@query(
    "q_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(wseq).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# lag/lead over an event stream.
# ---------------------------------------------------------------------------
@query(
    "q_lag_lead_events",
    sql="""
    SELECT event_id, user_id, ts,
           lag(event_type) OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts))
        .cast("long")
        .alias("secs_since_prev"),
    )


# ---------------------------------------------------------------------------
# Distributed global row_number: the scale-path replacement for
# Window.orderBy(...) with no partitionBy (which funnels the whole table
# through ONE task). Two passes, both distributed:
#   1. bucket rows by value-derived range cuts of the sort key (__pid, a
#      pure function of row values); count rows per bucket (a P-row
#      summary — P = shuffle partitions, not data);
#   2. prefix-sum the P counts (window over P rows) and broadcast-join
#      the offsets back; local row_number within each bucket + offset =
#      exact global row_number.
# The only "global" window in the plan runs over the P-row bucket
# summary — the same coordinator-sized step RDD.zipWithIndex performs —
# never over the data. Equal sort keys get equal pids, so rank ties
# never straddle buckets.
# ---------------------------------------------------------------------------
def _cut_projection(col, dtype):
    """Monotone double image of a sort column, or None when the type has
    no cheap monotone numeric projection (string/binary/struct)."""
    from pyspark.sql import types as T

    if isinstance(
        dtype,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        return col.cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.TimestampType):
        return col.cast("double")
    return None


def _ranged_with_offsets(
    df: DataFrame,
    order_cols: list[str],
    measure,
    num_partitions: int | None,
    agg: str = "sum",
) -> DataFrame:
    """Attach ``__pid`` (a range-bucket id that is monotone in the sort
    order) and ``__off`` = ``agg`` (sum|max) of ``measure`` over all
    PRECEDING range buckets. For ``max`` the offset is NULL in the first
    bucket.

    Determinism contract: ``__pid`` is a PURE FUNCTION of row values —
    p-1 approximate-quantile cuts of the leading sort key are collected
    once as literals and ``__pid = #cuts <= key``. The offsets branch
    and the data branch evaluate the identical expression, so they can
    never disagree, no matter how Catalyst duplicates or reorders the
    subtrees. (The previous formulation — sampled ``repartitionByRange``
    + ``spark_partition_id()`` pinned by a lazy localCheckpoint — left a
    race: broadcast exchanges execute on separate threads, and if one
    branch materialized the checkpoint while the other re-planned the
    subtree, each copy re-sampled range boundaries with a different
    RDD-id-derived seed. That was the round-3 `q_sequence_pack`
    nondeterministic hash mismatch.) Equal keys map to equal pids, so
    rank ties never straddle buckets. The cut values themselves may vary
    run-to-run (approxQuantile is an estimate); the OUTPUT does not —
    offsets always match the bucketing they were computed from, and the
    final rank/sum is exact for any bucketing.

    Scale: the cuts job scans only the leading key column (column-pruned
    parquet scan); the data pays ONE shuffle (the consumer's
    window-by-__pid), not the former two (range repartition + window),
    and nothing is checkpointed. The per-row bucket search is a linear
    scan of the p-1 literal array — fine for p ≤ a few thousand; switch
    to binary search via a range join if p ever needs to be larger.
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    lead = order_cols[0]
    proj = _cut_projection(F.col(lead), df.schema[lead].dataType)
    if proj is not None:
        probs = [i / p for i in range(1, p)]
        cuts = sorted(
            set(df.select(proj.alias("__k")).approxQuantile("__k", probs, 0.01))
        )
        if cuts:
            cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
            pid = F.size(F.filter(cut_arr, lambda c: c <= proj))
        else:
            pid = F.lit(0)
        ranged = df.withColumn("__pid", pid.cast("int"))
    else:
        # Non-numeric leading key: sampled range partitioning, pinned by
        # an EAGER local checkpoint so both branches read exactly one
        # materialization (no consumer currently takes this path).
        ranged = (
            df.repartitionByRange(p, *order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
    agg_fn = {"sum": F.sum, "max": F.max}[agg]
    per_part = ranged.groupBy("__pid").agg(agg_fn(measure).alias("__m"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = agg_fn("__m").over(w_off)
    if agg == "sum":
        off = F.coalesce(off, F.lit(0))
    offsets = per_part.select("__pid", off.alias("__off"))
    return ranged.join(F.broadcast(offsets), "__pid")


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    joined = _ranged_with_offsets(df, order_cols, F.lit(1), num_partitions)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return joined.withColumn(
        rn_col, (F.row_number().over(w_local) + F.col("__off")).cast("long")
    ).drop("__pid", "__off")


def distributed_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ORDER BY running sum without a single-partition window:
    local running sum within each range partition + the prefix-summed
    per-partition totals (a P-row summary) broadcast back."""
    joined = _ranged_with_offsets(df, order_cols, F.col(value_col), num_partitions)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn(
        out_col, F.sum(value_col).over(w_local) + F.col("__off")
    ).drop("__pid", "__off")


# ---------------------------------------------------------------------------
# ntile + percent_rank + dense_rank battery — distributed formulation.
#
# The naive form (Window.orderBy with no partitionBy for all four ranks)
# is exact but single-partition. Here:
#   * ntile/percent_rank over the near-unique (c_acctbal, c_custkey) key
#     derive arithmetically from distributed_row_number + the total count
#     (SQL-standard bucket sizing: first n%B buckets get one extra row);
#   * dense_rank/rank over the tiny-cardinality keys (5 segments, 25
#     nations) aggregate FIRST (distributed groupBy), then window over
#     the aggregated ≤25-row relation — the shuffle the plan pays is the
#     hash-agg, never a full-table single-partition sort.
# ---------------------------------------------------------------------------
@query(
    "q_rank_battery",
    sql="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
           CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_rank,
           CAST(rank() OVER (ORDER BY c_nationkey) AS BIGINT) AS nation_rank
    FROM customer
    """,
)
def q_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment", "c_nationkey"
    )

    # pass 1+2: exact global row number over the unique composite key
    base = distributed_row_number(cust, ["c_acctbal", "c_custkey"], rn_col="__rn")

    total = cust.agg(F.count(F.lit(1)).alias("__n"))
    b = base.crossJoin(F.broadcast(total))

    # SQL-standard ntile(B): q = n div B rows per bucket, first r = n mod B
    # buckets take one extra row
    buckets = F.lit(4)
    qsize = F.floor(F.col("__n") / buckets)
    r = F.col("__n") % buckets
    big = r * (qsize + 1)
    rn = F.col("__rn")
    quartile = F.when(
        rn <= big, F.floor((rn - 1) / (qsize + 1)) + 1
    ).otherwise(r + F.floor((rn - big - 1) / F.greatest(qsize, F.lit(1))) + 1)
    # unique sort key → rank == row_number, so percent_rank is arithmetic
    pct = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        (rn - 1).cast("double") / (F.col("__n") - 1).cast("double")
    )

    # dense_rank over 5 segments: distinct (distributed) then a 5-row window
    w_seg = Window.orderBy("c_mktsegment")
    segs = (
        cust.select("c_mktsegment")
        .distinct()
        .select(
            "c_mktsegment", F.row_number().over(w_seg).cast("long").alias("seg_rank")
        )
    )
    # rank over 25 nations: per-key counts (distributed agg) then a
    # 25-row prefix-sum window; rank = preceding rows + 1
    w_nat = Window.orderBy("c_nationkey").rowsBetween(Window.unboundedPreceding, -1)
    nations = (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "c_nationkey",
            (F.coalesce(F.sum("__cnt").over(w_nat), F.lit(0)) + 1)
            .cast("long")
            .alias("nation_rank"),
        )
    )

    return (
        b.join(F.broadcast(segs), "c_mktsegment")
        .join(F.broadcast(nations), "c_nationkey")
        .select(
            "c_custkey",
            quartile.cast("long").alias("quartile"),
            pct.alias("pct_rank"),
            "seg_rank",
            "nation_rank",
        )
    )


# ---------------------------------------------------------------------------
# RANGE-framed window: 30-day trailing order count per customer.
# Order key is an integer day offset so both engines use numeric RANGE.
# ---------------------------------------------------------------------------
@query(
    "q_range_window_30d",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', TIMESTAMP '1990-01-01 00:00:00', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_trailing_30d
    FROM orders
    """,
)
def q_range_window_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("long").alias("orders_trailing_30d"),
    )


# ---------------------------------------------------------------------------
# cume_dist over the whole table — distributed: cume_dist(x) = (number
# of rows with value <= x, peers included) / n. With the composite
# (c_acctbal, c_custkey) made unique, that count is max(rn) over the
# value's peer group — a partitionBy window over acctbal, never a
# global sort. The naive form is cume_dist() OVER (ORDER BY c_acctbal):
# single-partition.
# ---------------------------------------------------------------------------
@query(
    "q_cume_dist_acctbal",
    sql="""
    SELECT c_custkey, c_acctbal,
           cume_dist() OVER (ORDER BY c_acctbal) AS cd
    FROM customer
    """,
)
def q_cume_dist_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    base = distributed_row_number(cust, ["c_acctbal", "c_custkey"], rn_col="__rn")
    total = cust.agg(F.count(F.lit(1)).alias("__n"))
    w_peers = Window.partitionBy("c_acctbal")
    return (
        base.withColumn("__le_count", F.max("__rn").over(w_peers))
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("__le_count").cast("double") / F.col("__n").cast("double")).alias(
                "cd"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline) via distributed running max: an order
# is on the frontier iff its totalprice strictly exceeds every
# earlier-dated order's price. The global exclusive cumulative max is
# the same two-pass shape as distributed_row_number — local exclusive
# cummax within each range partition, prefix-maxed per-partition
# maxima broadcast back — so the skyline never funnels through one
# task. (The naive form is a bare ROWS UNBOUNDED PRECEDING window.)
# ---------------------------------------------------------------------------
@query(
    "q_pareto_frontier",
    sql="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT o_orderkey, o_orderdate, o_totalprice,
               MAX(o_totalprice) OVER (
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM orders
    )
    WHERE prev_max IS NULL OR o_totalprice > prev_max
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    order_cols = ["o_orderdate", "o_orderkey"]
    joined = _ranged_with_offsets(
        orders, order_cols, F.col("o_totalprice"), None, agg="max"
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.greatest(
        F.coalesce(F.max("o_totalprice").over(w_local), F.lit(float("-inf"))),
        F.coalesce(F.col("__off"), F.lit(float("-inf"))),
    )
    return (
        joined.withColumn("__prev", prev_max)
        .filter(F.col("o_totalprice") > F.col("__prev"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Centered moving average (ROWS k PRECEDING .. k FOLLOWING) per
# customer — the symmetric-frame smoothing shape (trend lines, outlier
# damping). Frame sums go through decimal for bit-stable division.
# ---------------------------------------------------------------------------
@query(
    "q_moving_avg_orders",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS ma5,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_n
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
    )
    """,
)
def q_moving_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 2)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma5"),
        F.count(F.lit(1)).over(w).cast("long").alias("frame_n"),
    )
