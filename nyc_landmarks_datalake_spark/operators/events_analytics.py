"""Product-analytics operators over the ``events`` stream table:
funnel conversion and weekly retention cohorts — the two standard
event-log rollups a lake's analytics tier serves (ABSENT in the
reference, whose streaming unit is a whole file: CSVIngest.java:217).

Both are two-level aggregations over user timelines: shuffle once by
user_id to derive per-user facts, then a small census aggregation.
Week arithmetic is pure date math (days since epoch / 7) — no
timezone-dependent functions, so results are identical under any
session timezone in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dprod_sum_sql, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

CONVERSION_DAYS = 7


# ---------------------------------------------------------------------------
# Funnel: of users whose first event-funnel step is a view, how many
# purchase within CONVERSION_DAYS of that first view.
# ---------------------------------------------------------------------------
@query(
    "q_funnel_conversion",
    sql=f"""
    WITH fv AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN fv ON fv.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
        GROUP BY 1
    )
    SELECT COUNT(*) AS n_viewers,
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                          AND first_purchase <= first_view + INTERVAL {CONVERSION_DAYS} DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ever_purchased
    FROM fv LEFT JOIN fp USING (user_id)
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    fv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    joined = fv.join(fp, "user_id", "left_outer")
    converted = F.col("first_purchase").isNotNull() & (
        F.col("first_purchase")
        <= F.col("first_view") + F.expr(f"INTERVAL {CONVERSION_DAYS} DAYS")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.sum(F.when(converted, 1).otherwise(0)).cast("long").alias("n_converted"),
        F.sum(F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_ever_purchased"),
    )


# ---------------------------------------------------------------------------
# Retention: users grouped by first-activity week; for each later week
# offset, how many of the cohort were active.
# ---------------------------------------------------------------------------
def _week_idx_spark(ts):
    return F.floor(
        F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")) / 7
    )


def _week_idx_sql(ts: str) -> str:
    return f"(datediff('day', DATE '1970-01-01', ({ts})::DATE) // 7)"


@query(
    "q_retention_cohorts",
    sql=f"""
    WITH user_weeks AS (
        SELECT DISTINCT user_id, {_week_idx_sql('ts')} AS week_idx
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(week_idx) AS cohort_week
        FROM user_weeks GROUP BY 1
    )
    SELECT cohort_week,
           week_idx - cohort_week AS week_offset,
           COUNT(*) AS n_active_users
    FROM user_weeks JOIN cohorts USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    user_weeks = events.select(
        "user_id", _week_idx_spark(F.col("ts")).alias("week_idx")
    ).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week_idx").alias("cohort_week")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Gap filling / densification: every 6-hour slot between the stream's
# min and max, per event type, with 0-filled counts — the sparse→dense
# resample every time-series consumer needs. The slot spine generates
# from ONE sequence() row per event type (no driver loop, no UDF); the
# left join is a broadcast of the (tiny) per-type aggregate spine onto
# the windowed counts at scale.
# ---------------------------------------------------------------------------
SLOT_HOURS = 6


@query(
    "q_gap_fill",
    sql=f"""
    WITH bounds AS (
        SELECT event_type,
               date_trunc('day', MIN(ts)) AS lo,
               time_bucket(INTERVAL {SLOT_HOURS} HOUR, MAX(ts)) AS hi
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL {SLOT_HOURS} HOUR)) AS slot
        FROM bounds
    ),
    counts AS (
        SELECT event_type,
               time_bucket(INTERVAL {SLOT_HOURS} HOUR, ts) AS slot,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT spine.event_type, spine.slot,
           COALESCE(n, 0) AS n_events
    FROM spine LEFT JOIN counts
      ON counts.event_type = spine.event_type AND counts.slot = spine.slot
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # upper bound = the LAST OCCUPIED slot (bucket of max ts), not the
    # day floor — a day-truncated bound would drop the final partial
    # day's slots (and their events) from the densified output.
    slot_secs = SLOT_HOURS * 3600
    bounds = events.groupBy("event_type").agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.expr(
            f"timestamp_seconds(unix_timestamp(max(ts)) div {slot_secs}"
            f" * {slot_secs})"
        ).alias("hi"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {SLOT_HOURS} HOURS"))
        ).alias("slot"),
    )
    counts = events.groupBy(
        "event_type",
        F.window("ts", f"{SLOT_HOURS} hours")["start"].alias("slot"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(counts, ["event_type", "slot"], "left_outer")
        .select(
            "event_type", "slot", F.coalesce("n", F.lit(0)).alias("n_events")
        )
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix: counts of consecutive (prev -> next)
# event types per user stream — the Markov-chain summary behind
# journey/anomaly analysis. One window shuffle on user_id (the same
# partitioning every other per-user op here uses), then a hash-agg on
# the (from, to) pair.
# ---------------------------------------------------------------------------
@query(
    "q_event_transitions",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build — gaps-and-islands over a change history.
# Classic warehouse modeling: collapse a customer's order-status
# history into versioned validity intervals (valid_from/valid_to,
# version number, is_current). The run detection is the lag-compare →
# change-flag → prefix-sum idiom; every value is a selected date or an
# integer, so the whole dimension is oracle-checked bit-exactly.
#
# Scale: two window passes over the same (custkey, date, key)
# ordering — Spark plans ONE shuffle and reuses the sort for both
# windows; no self-join, no collect. The output is dimension-sized
# (runs, not orders).
# ---------------------------------------------------------------------------
#: open-interval sentinel; kept inside datetime64[ns] range (pandas/
#: Arrow interop caps at 2262) unlike the warehouse-classic 9999-12-31
SCD2_OPEN_END = "2200-01-01"


@query(
    "q_scd2_intervals",
    sql=f"""
    WITH h AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
        SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS version
        FROM h
    ),
    iv AS (
        SELECT o_custkey, o_orderstatus, CAST(version AS BIGINT) AS version,
               MIN(o_orderdate) AS valid_from,
               COUNT(*) AS n_orders
        FROM runs GROUP BY 1, 2, 3
    )
    SELECT o_custkey, o_orderstatus, version, valid_from,
           COALESCE(LEAD(valid_from) OVER (PARTITION BY o_custkey
                                           ORDER BY version),
                    TIMESTAMP '{SCD2_OPEN_END} 00:00:00') AS valid_to,
           n_orders,
           LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
               IS NULL AS is_current
    FROM iv
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 100 == 0)
        .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = orders.select(
        "*",
        F.when(
            ~F.lag("o_orderstatus").over(w).eqNullSafe(F.col("o_orderstatus")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = h.select(
        "*",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "version"
        ),
    )
    iv = runs.groupBy(
        "o_custkey", "o_orderstatus", F.col("version").cast("long").alias("version")
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("version")
    nxt = F.lead("valid_from").over(wv)
    return iv.select(
        "o_custkey",
        "o_orderstatus",
        "version",
        "valid_from",
        F.coalesce(
            nxt, F.lit(f"{SCD2_OPEN_END} 00:00:00").cast("timestamp")
        ).alias("valid_to"),
        "n_orders",
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Per-series OLS trend: slope/intercept of value vs time for each event
# type — the regression aggregate behind drift dashboards and forecast
# seeds. All five sufficient statistics (n, Sx, Sy, Sxx, Sxy) are
# exact: the day-index sum stays in BIGINT (safe to ~10^14 rows/group),
# but Sxx and the slope denominator n*Sxx - Sx^2 go through
# DECIMAL(38,0) — at native sf1 a group's Sx^2 is already ~10^21, past
# int64, and the r8 native sweep caught exactly that overflow here.
# The value sums go through the decimal dsum/dprod_sum path, and
# slope/intercept derive from the exact statistics in identical float64
# expressions — so a regression aggregate, normally the epitome of
# float-order nondeterminism, sits under the bit-exact oracle. The
# exact-decimal→double casts route through VARCHAR on the DuckDB side
# (see functions/numeric.py: DuckDB's int128-decimal→double is not
# correctly rounded). One map-side-combinable aggregation; nothing else.
# ---------------------------------------------------------------------------
@query(
    "q_trend_slope",
    sql=f"""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(datediff('day', DATE '1970-01-01', ts::DATE))
                    AS BIGINT) AS sx,
               CAST(SUM(CAST(datediff('day', DATE '1970-01-01', ts::DATE)
                             AS DECIMAL(19,0))
                        * CAST(datediff('day', DATE '1970-01-01', ts::DATE)
                               AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxx,
               {dsum_sql('value')} AS sy,
               {dprod_sum_sql(
                   "datediff('day', DATE '1970-01-01', ts::DATE)", 'value'
               )} AS sxy
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT *,
               CAST(CAST(CAST(n AS DECIMAL(19,0)) * sxx
                         - CAST(sx AS DECIMAL(19,0))
                           * CAST(sx AS DECIMAL(19,0))
                         AS VARCHAR) AS DOUBLE) AS den
        FROM s
    )
    SELECT event_type, n, sx,
           CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxx,
           sy, sxy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / den
               AS slope,
           (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / den) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept
    FROM d
    """,
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_landmarks_datalake_spark.functions.numeric import dprod_sum, dsum

    ev = table(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    xd19 = x.cast("decimal(19,0)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("long").alias("sx"),
        # day^2 products and their sum in exact decimal: a BIGINT Sxx
        # holds only to ~10^9 rows/group at day-index ~2*10^4
        F.sum(xd19 * xd19).cast("decimal(38,0)").alias("sxx"),
        dsum(F.col("value")).alias("sy"),
        dprod_sum(x.cast("double"), F.col("value")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    # n*Sxx - Sx^2 exceeds int64 from sf1 up; compute it losslessly in
    # DECIMAL(38,0) and take ONE correctly-rounded cast to float64
    # (Spark's BigDecimal→double; the oracle routes via VARCHAR).
    den = (
        F.col("n").cast("decimal(19,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(19,0)") * F.col("sx").cast("decimal(19,0)")
    ).cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / den
    intercept = (F.col("sy") - slope * sxd) / nd
    # The OUTPUT sxx column is a single correctly-rounded decimal→double
    # cast (Spark BigDecimal→double; oracle VARCHAR-routed): a decimal
    # output column red-rows the driver gate — Spark's toPandas delivers
    # decimal.Decimal objects while DuckDB's fetchdf delivers float64,
    # and the driver hashes values as delivered (CORRECTNESS_r08). The
    # EXACT decimal still feeds `den`, so slope/intercept lose nothing.
    return s.select(
        "event_type",
        "n",
        "sx",
        F.col("sxx").cast("double").alias("sxx"),
        "sy",
        "sxy",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (the DAU/WAU curve). Sliding DISTINCT
# cannot partial-aggregate the way sums can — the classic fix is
# day-bucketing: reduce the stream to distinct (user, day) once (the
# only big shuffle), then each day's trailing window counts distinct
# users across its ≤7 buckets via a bounded range join on the (tiny)
# day spine. Work scales with active-users×7, never with raw events.
# The spine densifies from min to max day, so quiet days report their
# true trailing count instead of vanishing.
# ---------------------------------------------------------------------------
ROLLING_DAYS = 7


@query(
    "q_rolling_distinct_users",
    sql=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM bounds
    )
    SELECT s.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS rolling_users,
           CAST(COUNT(*) AS BIGINT) AS user_days
    FROM spine s
    JOIN ud u
      ON u.day BETWEEN s.day - INTERVAL {ROLLING_DAYS - 1} DAY AND s.day
    GROUP BY 1
    """,
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct().localCheckpoint(eager=False)
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    joined = F.broadcast(spine).alias("s").join(
        ud.alias("u"),
        F.col("u.day").between(
            F.col("s.day") - F.expr(f"INTERVAL {ROLLING_DAYS - 1} DAYS"),
            F.col("s.day"),
        ),
    )
    return joined.groupBy(F.col("s.day").alias("day")).agg(
        F.countDistinct("user_id").alias("rolling_users"),
        F.count(F.lit(1)).alias("user_days"),
    )


# ---------------------------------------------------------------------------
# Activity heatmap — the ops-dashboard staple: events bucketed by
# (day-of-week x hour-of-day) with distinct-user reach. Day-of-week
# numbering differs across engines (Spark dayofweek: Sunday=1; DuckDB
# dayofweek: Sunday=0), so the oracle adds 1 — pinning that the
# calendar arithmetic, not just the counting, agrees.
# ---------------------------------------------------------------------------
@query(
    "q_activity_heatmap",
    sql="""
    SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV — cumulative purchase revenue by signup cohort over
# weeks-since-signup. Cohort = week of the user's first event;
# revenue rides int64 micro-units so the per-cell sums AND the
# cumulative window are integer-exact. The cumulative runs over the
# bounded cohort x months matrix (months x cohorts cells, data-size
# independent after the first two aggs — the 100 TB-safe shape).
# ---------------------------------------------------------------------------
@query(
    "q_cohort_ltv",
    sql="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    monthly AS (
        SELECT e.user_id, f.cohort_week,
               date_trunc('week', e.ts) AS week,
               CAST(SUM(CASE WHEN e.event_type = 'purchase'
                        THEN CAST(floor(e.value * 1e6) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS rev_micros
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2, 3
    ),
    cells AS (
        SELECT cohort_week,
               CAST(datediff('day', cohort_week, week) // 7 AS BIGINT)
                   AS weeks_since,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
               CAST(SUM(rev_micros) AS BIGINT) AS revenue_micros
        FROM monthly
        GROUP BY 1, 2
    )
    SELECT cohort_week, weeks_since, n_active_users, revenue_micros,
           CAST(SUM(revenue_micros) OVER (
               PARTITION BY cohort_week ORDER BY weeks_since
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_revenue_micros
    FROM cells
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 1e6).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    monthly = (
        ev.join(firsts, "user_id")
        .groupBy(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("week"),
        )
        .agg(F.sum(rev).alias("rev_micros"))
    )
    cells = monthly.groupBy(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("weeks_since"),
    ).agg(
        F.countDistinct("user_id").alias("n_active_users"),
        F.sum("rev_micros").alias("revenue_micros"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_week",
        "weeks_since",
        "n_active_users",
        "revenue_micros",
        F.sum("revenue_micros").over(w).cast("long").alias(
            "cum_revenue_micros"
        ),
    )


# ---------------------------------------------------------------------------
# Event-machine conformance audit: sessionized lag pairs joined to a
# literal allowed-transition rule table (the data-quality twin of the
# Markov matrix in q_event_transitions — that one MEASURES transition
# mass, this one JUDGES it against a spec). Left join + flag, counts
# integer-exact; the rule table rides as a broadcast VALUES relation.
# ---------------------------------------------------------------------------
_ALLOWED_TRANSITIONS = [
    ("signup", "view"), ("signup", "click"),
    ("view", "click"), ("view", "view"),
    ("click", "purchase"), ("click", "view"),
    ("purchase", "view"), ("error", "view"),
]
_ALLOWED_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in _ALLOWED_TRANSITIONS)


@query(
    "q_illegal_transitions",
    sql=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    rules(prev_type, event_type) AS (VALUES {_ALLOWED_VALUES})
    SELECT s.prev_type, s.event_type AS next_type,
           COUNT(*) AS n_transitions,
           (r.prev_type IS NOT NULL) AS allowed
    FROM seq s
    LEFT JOIN rules r
      ON r.prev_type = s.prev_type AND r.event_type = s.event_type
    WHERE s.prev_type IS NOT NULL
    GROUP BY 1, 2, 4
    """,
)
def q_illegal_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    rules = F.broadcast(
        ev.sparkSession.createDataFrame(
            _ALLOWED_TRANSITIONS, ["prev_type", "event_type"]
        ).withColumn("__allowed", F.lit(True))
    )
    return (
        seq.join(rules, ["prev_type", "event_type"], "left")
        .select(
            "prev_type",
            F.col("event_type").alias("next_type"),
            F.coalesce(F.col("__allowed"), F.lit(False)).alias("allowed"),
        )
        .groupBy("prev_type", "next_type", "allowed")
        .agg(F.count("*").alias("n_transitions"))
        .select("prev_type", "next_type", "n_transitions", "allowed")
    )
