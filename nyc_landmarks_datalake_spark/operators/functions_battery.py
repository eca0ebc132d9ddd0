"""Scalar/analytic function batteries that round out SURVEY §2.B's
function checklist: distribution window functions (cume_dist /
nth_value / ntile), URL-key normalization (the reference's R2 operator,
CSVIngest.java:221-224), extended date arithmetic, JSON struct
round-trip (from_json → to_json), and initcap-style titling.

All pure map-side expression work (plus one window shuffle in the
analytic battery) — these exist to pin cross-engine semantics of the
long tail of scalar functions, not to exercise the planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# Distribution window battery: cume_dist / percent_rank / ntile /
# nth_value over a unique ordering (ties resolved by key so the peer-
# group–dependent functions agree across engines).
# ---------------------------------------------------------------------------
@query(
    "q_window_distribution",
    sql="""
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
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-02-01")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# URL-key normalization — the reference's R2 operator ('+' → space, then
# URL-decode; CSVIngest.java:221-224) as a data operation. The encoded
# key is constructed from table columns so the escape charset is known
# and the DuckDB oracle can mirror the decode with exact replaces.
# ---------------------------------------------------------------------------
@query(
    "q_url_key_normalize",
    sql="""
    SELECT c_custkey,
           replace(replace('raw/' || c_mktsegment || '%20' ||
                           CAST(c_custkey AS VARCHAR) || '+landmarks.csv',
                           '+', ' '),
                   '%20', ' ') AS object_key
    FROM customer
    """,
)
def q_url_key_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    encoded = F.concat(
        F.lit("raw/"),
        F.col("c_mktsegment"),
        F.lit("%20"),
        F.col("c_custkey").cast("string"),
        F.lit("+landmarks.csv"),
    )
    decoded = F.url_decode(F.regexp_replace(encoded, r"\+", " "))
    return cust.select("c_custkey", decoded.alias("object_key"))


# ---------------------------------------------------------------------------
# Extended date arithmetic: quarter / last_day / add_months / dayofyear
# / date_trunc('quarter') — aggregated so month-end clamping behavior is
# visible in the result.
# ---------------------------------------------------------------------------
@query(
    "q_date_arithmetic",
    sql="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           MIN(date_trunc('quarter', o_orderdate)) AS qtr_start,
           MAX(last_day(o_orderdate))::TIMESTAMP AS last_eom,
           MAX((o_orderdate + INTERVAL 3 MONTH)::DATE)::TIMESTAMP AS max_plus3m,
           MAX(CAST(dayofyear(o_orderdate) AS BIGINT)) AS max_doy,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.min(F.date_trunc("quarter", F.col("o_orderdate"))).alias("qtr_start"),
            F.max(F.last_day("o_orderdate")).cast("timestamp").alias("last_eom"),
            F.max(F.add_months("o_orderdate", 3)).cast("timestamp").alias("max_plus3m"),
            F.max(F.dayofyear("o_orderdate").cast("long")).alias("max_doy"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# JSON struct round-trip: from_json into a typed struct, filter on the
# typed field, re-serialize with to_json (both engines emit compact
# '{"k":N}' form).
# ---------------------------------------------------------------------------
@query(
    "q_json_roundtrip",
    sql="""
    SELECT event_id,
           json_extract(props, '$.k')::BIGINT AS k,
           to_json(struct_pack(k := json_extract(props, '$.k')::BIGINT))::VARCHAR
               AS props_norm
    FROM events
    WHERE json_extract(props, '$.k')::BIGINT >= 50
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        events.select("event_id", parsed["k"].alias("k"))
        .filter(F.col("k") >= 50)
        .select("event_id", "k", F.to_json(F.struct("k")).alias("props_norm"))
    )


# ---------------------------------------------------------------------------
# initcap titling (DuckDB has no initcap; the oracle mirrors it with a
# word-wise upper/lower rewrite over the known single-space charset).
# ---------------------------------------------------------------------------
@query(
    "q_initcap_titles",
    sql="""
    SELECT DISTINCT p_name,
           array_to_string(
               list_transform(string_split(lower(p_name), ' '),
                              w -> upper(w[1]) || w[2:]),
               ' ') AS title
    FROM part
    """,
)
def q_initcap_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select("p_name", F.initcap(F.col("p_name")).alias("title")).distinct()


# ---------------------------------------------------------------------------
# Group-concat + boolean aggregates: string_agg with a deterministic
# order (Spark: sort the collected array, then join — collect_list
# order is partition-dependent, array_sort restores determinism at any
# parallelism) and bool_and/bool_or.
# ---------------------------------------------------------------------------
@query(
    "q_group_concat_bools",
    sql="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def q_group_concat_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Bitwise expression battery over integer keys (hash/partition math and
# flag fields all ride on these): and/or/xor, shifts, bit_count.
# All pure codegen in Spark; DuckDB spells xor as a function and
# shifts with operators.
# ---------------------------------------------------------------------------
@query(
    "q_bitwise_ops",
    sql="""
    SELECT c_custkey,
           c_custkey & 255 AS low_byte,
           c_custkey | 4096 AS with_flag,
           xor(c_custkey, 1431655765) AS xored,
           c_custkey << 3 AS shl3,
           c_custkey >> 2 AS shr2,
           CAST(bit_count(c_custkey) AS INT) AS popcount
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def q_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return cust.filter(k % 10 == 0).select(
        "c_custkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1431655765)).alias("xored"),
        # shift on the LONG column directly — an int cast would wrap for
        # custkey >= 2^31 (and overflow shl3 from 2^28), diverging from
        # the oracle's 64-bit shifts at large scale factors
        F.shiftleft(k, 3).cast("long").alias("shl3"),
        F.shiftright(k, 2).cast("long").alias("shr2"),
        F.bit_count(k).alias("popcount"),
    )


# ---------------------------------------------------------------------------
# Edit-distance battery: levenshtein against a canonical token — the
# primitive under fuzzy entity matching / typo-tolerant dedup. Pure
# map-side codegen; the near-match filter shows the predicate shape a
# fuzzy-join blocking stage pushes down.
# ---------------------------------------------------------------------------
@query(
    "q_edit_distance",
    sql="""
    SELECT p_partkey, p_brand,
           CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS dist_canon,
           CAST(levenshtein(p_type, p_brand) AS INT) AS dist_cross,
           (levenshtein(p_brand, 'Brand#33') <= 2) AS near_canon
    FROM part
    WHERE p_partkey % 7 = 0
    """,
)
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        "p_brand",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).alias("dist_canon"),
        F.levenshtein(F.col("p_type"), F.col("p_brand")).alias("dist_cross"),
        (F.levenshtein(F.col("p_brand"), F.lit("Brand#33")) <= 2).alias(
            "near_canon"
        ),
    )


# ---------------------------------------------------------------------------
# listagg WITHIN GROUP (Spark 4): ordered string aggregation as a TRUE
# ordered aggregate — unlike the collect_set+array_sort rewrite above,
# the ordering is part of the aggregate's contract, so Catalyst owns
# the sort (partial aggregation still applies). Dedup tie-break and
# ordering are explicit, so the result is deterministic at any
# parallelism.
# ---------------------------------------------------------------------------
@query(
    "q_listagg_ordered",
    sql="""
    WITH pairs AS (
        SELECT DISTINCT c_mktsegment, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT c_mktsegment,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM pairs
    GROUP BY c_mktsegment
    """,
)
def q_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations per market segment via listagg … WITHIN GROUP.

    The distinct pairs are pre-aggregated (one hash-distinct shuffle)
    before the ordered aggregate — which sidesteps a Spark 4.1 ListAgg
    bug (withNewChildrenInternal class-cast when the DISTINCT-rewrite
    transforms the aggregate) and is the better plan anyway: listagg
    sorts far fewer rows.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("la_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("la_nation")
    return spark.sql(
        """
        WITH pairs AS (
            SELECT DISTINCT c_mktsegment, n_name
            FROM la_customer JOIN la_nation ON c_nationkey = n_nationkey
        )
        SELECT c_mktsegment,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM pairs
        GROUP BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# try_* error-safe arithmetic (the ANSI-mode story: Spark 4 enables
# ANSI SQL by default, so div-by-zero / bad casts / overflow THROW
# unless routed through the try_ family, which yields NULL instead).
# The oracle reproduces each NULL contract with explicit CASE guards —
# a green row pins the exact null-production semantics.
# ---------------------------------------------------------------------------
@query(
    "q_try_arithmetic",
    sql=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_null,
           {dsum_sql("CASE WHEN l_quantity = 25 THEN NULL "
                     "ELSE l_extendedprice / (l_quantity - 25) END")}
               AS div_sum,
           CAST(SUM(CASE WHEN l_orderkey % 20 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_cast_null,
           CAST(SUM(CASE WHEN l_orderkey % 20 = 0 THEN NULL
                    ELSE CAST(l_orderkey AS BIGINT) END) AS BIGINT)
               AS cast_sum,
           CAST(SUM(CASE WHEN l_orderkey % 101 = 100 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overflow_null
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-error arithmetic census per return flag.

    try_divide hits a real zero denominator (quantity == 25, 2% of
    rows), try_cast parses a string column that is non-numeric on 1/20
    of rows, try_add overflows int64 max on 1/101 of rows — each NULL
    count and the surviving sums are mirrored by CASE-guard arithmetic
    in the oracle.

    Error-branch density is deliberately LOW (~2%/5%/1%): each caught
    error is a real JVM exception throw inside the try-expression, so
    a majority-error data shape turns a single scan+agg into an
    exception storm (~30x constant factor measured at 60%/33% density
    in r7). The contracts are identical at any density; the bench
    number should measure the engine, not fillInStackTrace(). At
    sf0.01 the rare arm still NULLs ~600 rows — plenty for the gate.
    """
    li = table(spark, sf_dir, "lineitem")
    mixed = F.when(
        F.col("l_orderkey") % 20 == 0,
        F.concat(F.lit("k"), F.col("l_orderkey").cast("string")),
    ).otherwise(F.col("l_orderkey").cast("string"))
    d = F.expr("try_divide(l_extendedprice, l_quantity - 25)")
    c = F.expr("try_cast(mixed AS BIGINT)")
    # base + 99 == int64 max: only the 1/101 rows with remainder 100
    # overflow
    ovf = F.expr("try_add(9223372036854775708L, l_orderkey % 101)")
    base = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
        mixed.alias("mixed"),
    ).select(
        "l_returnflag",
        d.alias("d"),
        c.alias("c"),
        ovf.alias("ovf"),
    )
    return base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("d").isNull(), 1).otherwise(0)).alias("n_div_null"),
        dsum(F.col("d")).alias("div_sum"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).alias(
            "n_cast_null"
        ),
        F.sum("c").alias("cast_sum"),
        F.sum(F.when(F.col("ovf").isNull(), 1).otherwise(0)).alias(
            "n_overflow_null"
        ),
    )


# ---------------------------------------------------------------------------
# Map higher-order functions: map_from_entries → map_filter →
# transform_values → transform_keys → map_entries, end to end. The
# oracle never touches a map — plain GROUP BY + HAVING + string concat
# must reproduce the exploded entries exactly, so every map HOF's
# semantics (not just its parse) is under the gate.
# ---------------------------------------------------------------------------
MAP_HOF_MIN_COUNT = 10


@query(
    "q_map_hof_battery",
    sql=f"""
    SELECT o_orderpriority,
           's_' || o_orderstatus AS status_key,
           CAST(COUNT(*) * 2 AS BIGINT) AS doubled_count
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    HAVING COUNT(*) > {MAP_HOF_MIN_COUNT}
    """,
)
def q_map_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status-count maps built, filtered, and rewritten per priority."""
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    mapped = counts.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("o_orderstatus"), F.col("cnt")))
            )
        ).alias("status_counts")
    )
    rewritten = mapped.select(
        "o_orderpriority",
        F.transform_keys(
            F.transform_values(
                F.map_filter(
                    F.col("status_counts"),
                    lambda k, v: v > MAP_HOF_MIN_COUNT,
                ),
                lambda k, v: v * 2,
            ),
            lambda k, v: F.concat(F.lit("s_"), k),
        ).alias("adjusted"),
    )
    return rewritten.select(
        "o_orderpriority", F.explode(F.col("adjusted"))
    ).select(
        "o_orderpriority",
        F.col("key").alias("status_key"),
        F.col("value").cast("long").alias("doubled_count"),
    )


# ---------------------------------------------------------------------------
# Modern string/regex battery: split_part, regexp_count, regexp_substr,
# left/right, repeat, reverse — the Spark 3.5+/4.x additions to the
# scalar string lexicon, each with an exact RE2/DuckDB twin
# (regexp_substr's no-match NULL maps to NULLIF(regexp_extract, '')).
# ---------------------------------------------------------------------------
@query(
    "q_string_funcs3",
    sql="""
    SELECT DISTINCT p_name,
           split_part(p_name, ' ', 2) AS second_word,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT)
               AS vowel_runs,
           NULLIF(regexp_extract(p_name, '[aeiou]{2,}'), '') AS first_di,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           repeat(left(p_name, 2), 2) AS rep2,
           reverse(split_part(p_name, ' ', 1)) AS rev_first
    FROM part
    """,
)
def q_string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]+"))
        .cast("long")
        .alias("vowel_runs"),
        F.regexp_substr(F.col("p_name"), F.lit("[aeiou]{2,}")).alias(
            "first_di"
        ),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.repeat(F.expr("left(p_name, 2)"), 2).alias("rep2"),
        F.reverse(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))).alias(
            "rev_first"
        ),
    ).distinct()
