"""Time-series finance-style aggregates and higher-moment statistics:
time-weighted average (TWAP), OHLC bars, skewness/kurtosis from exact
power sums, deterministic mode, and tokenizer vocabulary coverage.

Determinism strategy per STATUS.md: integer/exact-decimal aggregation
everywhere, floats derived only in a final projection whose expression
shape is written IDENTICALLY in both engines (each IEEE op is
correctly rounded, so identical inputs + identical op order = identical
bits). Ties are broken by struct-ordering on explicit keys — never an
engine's arbitrary arg_min/arg_max pick.

Scale posture: TWAP/OHLC partition windows by (event_type, day) — the
partition is day-bounded, so no window ever sorts more than one
group-day (the classic hypertable chunking); everything else is plain
hash aggregation. The vocabulary join broadcasts a 100-row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import (
    dprod_sum,
    dprod_sum_sql,
)
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# TWAP: each observation holds until the next one in its (type, day)
# group; the average weights values by that holding duration (ms).
# ---------------------------------------------------------------------------
@query(
    "q_time_weighted_avg",
    sql=f"""
    WITH seq AS (
        SELECT event_type, date_trunc('day', ts) AS day, value,
               (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000 AS dur_ms
        FROM events
        WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                     ORDER BY ts, event_id)
    )
    SELECT event_type, day,
           COUNT(*) AS n_intervals,
           CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
           {dprod_sum_sql('value', 'dur_ms')} AS wsum,
           {dprod_sum_sql('value', 'dur_ms')}
               / CAST(CAST(SUM(dur_ms) AS BIGINT) AS DOUBLE) AS twap
    FROM seq
    WHERE dur_ms IS NOT NULL
    GROUP BY event_type, day
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-chunked TWAP of event values per event type.

    Durations are integer milliseconds (day-bounded, so the (18,6)
    decimal product operand bound holds with 5 orders of headroom);
    the weighted sum rides the exact decimal product path and the
    final division is one double op written identically in both
    engines. Single-event days contribute no interval and drop out —
    identical group-vanishing semantics on both sides.
    """
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    seq = (
        ev.select("event_type", day.alias("day"), "ts", "event_id", "value")
        .withColumn("nts", F.lead("ts").over(w))
        .withColumn(
            "dur_ms",
            F.expr("(unix_micros(nts) - unix_micros(ts)) div 1000"),
        )
        .filter(F.col("dur_ms").isNotNull())
    )
    total_ms = F.sum("dur_ms").cast("long")
    wsum = dprod_sum(F.col("value"), F.col("dur_ms"))
    return seq.groupBy("event_type", "day").agg(
        F.count("*").alias("n_intervals"),
        total_ms.alias("total_ms"),
        wsum.alias("wsum"),
        (wsum / total_ms.cast("double")).alias("twap"),
    )


# ---------------------------------------------------------------------------
# OHLC bars: open/close picked by struct-ordered min/max over
# (ts, event_id, value) — deterministic under ts ties, no arg_min.
# ---------------------------------------------------------------------------
@query(
    "q_ohlc_bars",
    sql="""
    SELECT event_type, date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           (MIN({'t': ts, 'e': event_id, 'v': value})).v AS open_v,
           (MAX({'t': ts, 'e': event_id, 'v': value})).v AS close_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks per event type — one hash aggregation.

    Open/close are min/max over the struct (ts, event_id, value):
    lexicographic struct comparison makes the pick deterministic even
    when timestamps collide, and the whole bar is a single map-side-
    combinable agg (no window, no self-join).
    """
    ev = table(spark, sf_dir, "events")
    s = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("e"),
                 F.col("value").alias("v"))
    return (
        ev.select("event_type", F.date_trunc("day", F.col("ts")).alias("day"), "ts",
                  "event_id", "value")
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.min(s)["v"].alias("open_v"),
            F.max(s)["v"].alias("close_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
        )
    )


# ---------------------------------------------------------------------------
# Skewness / kurtosis from exact integer power sums. l_quantity is
# integral and <= 50, so s4 fits int64 with ~8 orders of headroom at
# sf1000; the float moments derive from exact sums in one projection.
# ---------------------------------------------------------------------------
@query(
    "q_skewness_kurtosis",
    sql="""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(q * q) AS BIGINT) AS s2,
               CAST(SUM(q * q * q) AS BIGINT) AS s3,
               CAST(SUM(q * q * q * q) AS BIGINT) AS s4
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
              FROM lineitem)
        GROUP BY l_returnflag
    ),
    m AS (
        SELECT l_returnflag, n, s1, s2, s3, s4,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        FROM sums
    )
    SELECT l_returnflag, n, s1, s2, s3, s4,
           (r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean)
               / ((r2 - mean * mean) * sqrt(r2 - mean * mean)) AS skewness,
           (r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
              - 3.0 * mean * mean * mean * mean)
               / ((r2 - mean * mean) * (r2 - mean * mean)) - 3.0
               AS excess_kurtosis
    FROM m
    """,
)
def q_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per return flag.

    Integer power sums are exact; the moment formulas are spelled with
    the same operation order as the oracle SQL, so every double is
    bit-identical (no aggregation-order dependence anywhere).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d
    r2 = F.col("s2").cast("double") / n_d
    r3 = F.col("s3").cast("double") / n_d
    r4 = F.col("s4").cast("double") / n_d
    m2 = r2 - mean * mean
    skew = (r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean) / (
        m2 * F.sqrt(m2)
    )
    kurt = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    ) / (m2 * m2) - F.lit(3.0)
    return sums.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        skew.alias("skewness"),
        kurt.alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Mode with deterministic tie-break (highest count, then SMALLEST
# value) — struct-ordered max over (count, -value), never arg_max.
# ---------------------------------------------------------------------------
@query(
    "q_mode_quantity",
    sql="""
    WITH counts AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(-((MAX({'c': cnt, 'nq': -q})).nq) AS BIGINT) AS mode_q,
           CAST((MAX({'c': cnt, 'nq': -q})).c AS BIGINT) AS mode_count,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_q
    FROM counts
    GROUP BY l_returnflag
    """,
)
def q_mode_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal quantity per return flag (two chained hash aggs)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    counts = li.groupBy("l_returnflag", "q").agg(F.count("*").alias("cnt"))
    pick = F.max(
        F.struct(F.col("cnt").alias("c"), (-F.col("q")).alias("nq"))
    )
    return counts.groupBy("l_returnflag").agg(
        (-pick["nq"]).cast("long").alias("mode_q"),
        pick["c"].cast("long").alias("mode_count"),
        F.count("*").alias("n_distinct_q"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage: OOV rate per source against the
# corpus top-K vocabulary — the planning number behind vocab sizing.
# ---------------------------------------------------------------------------
_VOCAB_K = 100


@query(
    "q_tokenizer_coverage",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS cnt FROM clean GROUP BY tok
        ) ORDER BY cnt DESC, tok LIMIT {_VOCAB_K}
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(1000000 * SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS oov_ppm
    FROM clean c LEFT JOIN vocab v USING (tok)
    GROUP BY source
    """,
)
def q_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary rate against the global top-100.

    The vocabulary is a deterministic top-K (count desc, token asc —
    TakeOrdered, no full sort) broadcast to a map-side left join; the
    OOV rate is fixed-point ppm (integer division, no float). At 100 TB
    the exploded token relation never joins anything larger than the
    K-row vocabulary.
    """
    docs = table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return joined.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        oov.alias("n_oov"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)"
            " div count(*) AS BIGINT)"
        ).alias("oov_ppm"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection — the sequential change-point statistic
# S+_i = max(0, S+_{i-1} + (x_i - k)) over daily event counts. The
# recurrence is inherently order-sequential; here the day series per
# event type is BOUNDED (cardinality = days x types, independent of
# data size), so after the daily hash-agg the whole series folds
# map-side inside one array `aggregate` — the standard two-level shape
# for sequential statistics at 100 TB (shuffle reduces to bounded
# series; recurrence runs on the series, never on raw rows). The
# oracle computes the SAME recurrence with a recursive CTE — two
# independent formulations of the fold must agree exactly (all
# integers: counts, integer-division baseline, max).
# ---------------------------------------------------------------------------
@query(
    "q_cusum_drift",
    sql="""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS total_events,
               COUNT(*) AS n_days,
               CAST(SUM(c) // COUNT(*) AS BIGINT) AS k
        FROM daily
        GROUP BY event_type
    ),
    idx AS (
        SELECT d.event_type, d.c, s.k,
               row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
                   AS i
        FROM daily d JOIN stats s USING (event_type)
    ),
    rec AS (
        SELECT event_type, i, GREATEST(0, c - k) AS s,
               GREATEST(0, c - k) AS mx
        FROM idx WHERE i = 1
        UNION ALL
        SELECT n.event_type, n.i, GREATEST(0, r.s + n.c - n.k),
               GREATEST(r.mx, GREATEST(0, r.s + n.c - n.k))
        FROM rec r JOIN idx n
          ON n.event_type = r.event_type AND n.i = r.i + 1
    ),
    final AS (
        SELECT event_type, CAST(mx AS BIGINT) AS max_cusum
        FROM rec
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY i DESC) = 1
    )
    SELECT s.event_type, s.n_days, s.total_events, s.k, f.max_cusum,
           f.max_cusum > 3 * s.k AS drift_alarm
    FROM stats s JOIN final f USING (event_type)
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM+ drift statistic over daily event counts."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    per_type = daily.groupBy("event_type").agg(
        F.sum("c").alias("total_events"),
        F.count("*").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("c")))
        ).alias("series"),
    ).withColumn(
        "k", F.expr("total_events div n_days")
    )
    fold = F.aggregate(
        F.col("series"),
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("mx")
        ),
        lambda acc, e: F.struct(
            F.greatest(F.lit(0).cast("long"), acc["s"] + e["c"] - F.col("k")).alias("s"),
            F.greatest(
                acc["mx"],
                F.greatest(
                    F.lit(0).cast("long"), acc["s"] + e["c"] - F.col("k")
                ),
            ).alias("mx"),
        ),
    )
    return per_type.select(
        "event_type",
        "n_days",
        "total_events",
        "k",
        fold["mx"].alias("max_cusum"),
        (fold["mx"] > 3 * F.col("k")).alias("drift_alarm"),
    )


# ---------------------------------------------------------------------------
# Exact trimmed (winsorless) mean via the histogram rewrite. Naive
# trimming ranks every row (per-group global sort — unbounded window
# partitions at 100 TB); because l_quantity has a small integer domain,
# the exact same answer comes from the per-(group, value) COUNT
# histogram: cumulative counts locate the trim boundaries and integer
# clamp arithmetic keeps exactly n - 2*floor(n*5/100) rows, boundary
# values partially. One data shuffle (the histogram agg); the running
# window runs over the <=50-row-per-group histogram.
# ---------------------------------------------------------------------------
TRIM_PCT = 5


@query(
    "q_trimmed_mean",
    sql=f"""
    WITH hist AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT l_returnflag, q, cnt,
               CAST(COALESCE(SUM(cnt) OVER (
                   PARTITION BY l_returnflag ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before,
               CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        FROM hist
    ),
    kept AS (
        SELECT l_returnflag, q, n,
               GREATEST(0::BIGINT,
                   LEAST(cum_before + cnt, n - (n * {TRIM_PCT}) // 100)
                   - GREATEST(cum_before, (n * {TRIM_PCT}) // 100)
               ) AS k_cnt
        FROM cum
    )
    SELECT l_returnflag,
           MAX(n) AS n,
           CAST(SUM(k_cnt) AS BIGINT) AS n_kept,
           CAST(SUM(q * k_cnt) AS BIGINT) AS kept_sum,
           CAST(CAST(SUM(q * k_cnt) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(k_cnt) AS BIGINT) AS DOUBLE) AS trimmed_mean
    FROM kept
    GROUP BY l_returnflag
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-trimmed mean of quantity per return flag."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    hist = li.groupBy("l_returnflag", "q").agg(F.count("*").alias("cnt"))
    w_before = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "q",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_before), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    lo = F.expr(f"(n * {TRIM_PCT}) div 100")
    hi = F.col("n") - lo
    k_cnt = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum_before") + F.col("cnt"), hi)
        - F.greatest(F.col("cum_before"), lo),
    )
    kept = cum.select("l_returnflag", "q", "n", k_cnt.alias("k_cnt"))
    return kept.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        F.sum("k_cnt").alias("n_kept"),
        F.sum(F.col("q") * F.col("k_cnt")).alias("kept_sum"),
        (
            F.sum(F.col("q") * F.col("k_cnt")).cast("double")
            / F.sum("k_cnt").cast("double")
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# Recency-decayed counts — freshness weighting for sampling/serving
# (recent activity counts more, halving per day of age). The weight
# 2^(30 - age) is an exact int64 (ages > 30 days truncate to 0 —
# documented cutoff), so the weighted sum is plain integer arithmetic:
# no float power, no accumulation-order dependence, no libm.
# Headroom: daily counts <= ~1e6 * 2^30 ~ 1.1e15 per term, x90 days
# ~ 1e17 < 2^63.
# ---------------------------------------------------------------------------
DECAY_HORIZON_DAYS = 30


@query(
    "q_decayed_counts",
    sql=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    ),
    aged AS (
        SELECT event_type, c,
               datediff('day', day,
                        (SELECT MAX(date_trunc('day', ts)) FROM events))
                   AS age
        FROM daily
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS total_events,
           CAST(SUM(CASE WHEN age <= {DECAY_HORIZON_DAYS}
                    THEN c * (1::BIGINT << ({DECAY_HORIZON_DAYS} - age))
                    ELSE 0 END) AS BIGINT) AS decayed_weight,
           CAST(SUM(CASE WHEN age <= {DECAY_HORIZON_DAYS} THEN c ELSE 0 END)
               AS BIGINT) AS recent_events
    FROM aged
    GROUP BY event_type
    """,
)
def q_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type exponentially-decayed activity weight (integer-exact)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    maxday = ev.agg(
        F.max(F.date_trunc("day", F.col("ts"))).alias("maxday")
    )
    aged = daily.crossJoin(F.broadcast(maxday)).select(
        "event_type",
        "c",
        F.datediff(F.col("maxday"), F.col("day")).alias("age"),
    )
    h = DECAY_HORIZON_DAYS
    weight = F.when(
        F.col("age") <= h,
        F.col("c") * F.expr(f"shiftleft(1L, {h} - age)"),
    ).otherwise(F.lit(0).cast("long"))
    recent = F.when(F.col("age") <= h, F.col("c")).otherwise(
        F.lit(0).cast("long")
    )
    return aged.groupBy("event_type").agg(
        F.sum("c").alias("total_events"),
        F.sum(weight).alias("decayed_weight"),
        F.sum(recent).alias("recent_events"),
    )


# ---------------------------------------------------------------------------
# SAX symbolization (Symbolic Aggregate approXimation, the iSAX-family
# primitive): z-normalize the per-type daily-count series, discretize
# each day into a 4-symbol alphabet at the standard Gaussian
# breakpoints, and emit one SAX word per (type, ISO week). Mean/sigma
# derive from exact integer power sums, so the z-scores and breakpoint
# comparisons are the identical float64 computation in both engines —
# the symbolic words are bit-reproducible, which is what makes SAX
# words usable as grouping/index keys downstream.
# ---------------------------------------------------------------------------
_SAX_B1, _SAX_B3 = -0.6744897501960817, 0.6744897501960817


@query(
    "q_sax_words",
    sql=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM daily GROUP BY event_type
    ),
    sym AS (
        SELECT d.event_type, d.day,
               date_trunc('week', d.day) AS week,
               CASE
                 WHEN (CAST(d.c AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                      / sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                             - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                               * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)))
                      < {_SAX_B1} THEN 'a'
                 WHEN (CAST(d.c AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                      / sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                             - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                               * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)))
                      < 0.0 THEN 'b'
                 WHEN (CAST(d.c AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                      / sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                             - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                               * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)))
                      < {_SAX_B3} THEN 'c'
                 ELSE 'd'
               END AS symbol
        FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type, week,
           string_agg(symbol, '' ORDER BY day) AS sax_word,
           COUNT(*) AS n_days
    FROM sym
    GROUP BY event_type, week
    """,
)
def q_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly SAX words over z-normalized daily event counts."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d
    sigma = F.sqrt(
        F.col("s2").cast("double") / n_d - mean * mean
    )
    z = (F.col("c").cast("double") - mean) / sigma
    symbol = (
        F.when(z < _SAX_B1, "a")
        .when(z < 0.0, "b")
        .when(z < _SAX_B3, "c")
        .otherwise("d")
    )
    sym = j.select(
        "event_type",
        "day",
        F.date_trunc("week", F.col("day")).alias("week"),
        symbol.alias("symbol"),
    )
    word = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("symbol")))
            ),
            lambda x: x["symbol"],
        ),
        "",
    )
    return sym.groupBy("event_type", "week").agg(
        word.alias("sax_word"), F.count("*").alias("n_days")
    )
