"""Spark 4 SQL-surface coverage: VARIANT shredding, SQL UDFs, string
collations, SQL pipe syntax, and LATERAL correlated subqueries.

The reference lake stores event payloads as raw JSON strings
(``events.props``); a modern engine must shred semi-structured data
without a Python hop. These queries exercise the Spark 4 native
surfaces for that — each one oracle-checked bit-exactly against a
DuckDB formulation that uses only portable ANSI SQL (``json_extract``,
inlined UDF bodies, ``lower()`` for collation folding, plain SQL for
the pipe form), so a green row proves the *semantics*, not just that
the feature parses.

Scale posture: every query here is a single scan → (optional map) →
one hash-agg shuffle. VARIANT extraction, SQL-UDF bodies, collation
keys and pipe-syntax stages all run JVM-side inside whole-stage
codegen — no Python, no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.numeric import dsum, dsum_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# VARIANT: parse_json → variant_get typed extraction (Spark 4 native
# semi-structured type; the binary-encoded variant beats per-row JSON
# string re-parsing at scale and supports shredded columnar pushdown).
# ---------------------------------------------------------------------------
@query(
    "q_variant_shred",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT) % 2) AS BIGINT) AS n_odd
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred the JSON event payload through the VARIANT type.

    ``parse_json`` builds the binary variant once; ``variant_get`` does
    a typed path extraction (no string re-parse, no schema inference
    pass). The oracle extracts the same path with DuckDB's JSON
    operators — integer-exact aggregation on both sides.
    """
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k") % 2).alias("n_odd"),
        )
    )


# ---------------------------------------------------------------------------
# SQL UDFs (CREATE FUNCTION ... RETURN expr): reusable scalar logic that
# stays declarative — Catalyst inlines the body, so unlike a Python UDF
# the call sites remain inside codegen and predicate pushdown.
# ---------------------------------------------------------------------------
@query(
    "q_sql_udf_pricing",
    sql=f"""
    SELECT upper(l_returnflag) || '/' || upper(l_linestatus) AS code,
           CAST(FLOOR(l_extendedprice * (1 - l_discount) / 5000.0) AS BIGINT)
               AS bucket,
           COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group lineitem through two SQL UDFs (scalar, declarative).

    The UDF bodies are pure SQL expressions, so the oracle simply
    inlines them — a green row proves Spark's SQL-UDF inlining computes
    exactly what the expression says. FLOOR of the identical IEEE
    double is deterministic across engines (no aggregation-order
    dependence); the quantity sum rides the decimal-exact path.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge_bucket"
        "(price DOUBLE, disc DOUBLE) RETURNS BIGINT "
        "RETURN CAST(FLOOR(price * (1 - disc) / 5000.0) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION flag_code"
        "(rf STRING, ls STRING) RETURNS STRING "
        "RETURN concat(upper(rf), '/', upper(ls))"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    mapped = spark.sql(
        "SELECT flag_code(l_returnflag, l_linestatus) AS code, "
        "charge_bucket(l_extendedprice, l_discount) AS bucket, l_quantity "
        "FROM sqludf_lineitem"
    )
    return mapped.groupBy("code", "bucket").agg(
        F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# Collations: UTF8_LCASE distinct-counting and literal comparison.
# Collation travels with the *value* (no per-comparison lower() calls),
# and the collation key is what shuffles — at 100 TB that is the
# difference between one normalized exchange and a lower() map stage
# glued onto every consumer.
# ---------------------------------------------------------------------------
@query(
    "q_collation_distinct",
    sql="""
    WITH noisy AS (
        SELECT c_nationkey,
               CASE c_custkey % 3
                   WHEN 0 THEN lower(c_mktsegment)
                   WHEN 1 THEN upper(substr(c_mktsegment, 1, 1))
                            || lower(substr(c_mktsegment, 2))
                   ELSE c_mktsegment
               END AS seg
        FROM customer
    )
    SELECT c_nationkey,
           COUNT(DISTINCT seg) AS raw_variants,
           COUNT(DISTINCT lower(seg)) AS folded_variants,
           CAST(SUM(CASE WHEN lower(seg) = 'machinery' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_machinery
    FROM noisy
    GROUP BY c_nationkey
    """,
)
def q_collation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-noisy segment labels folded under the UTF8_LCASE collation.

    Distinct-count and literal equality run on the *collated* string —
    no lower() in the Spark plan. The oracle proves the semantics with
    explicit lower() folding.
    """
    cust = table(spark, sf_dir, "customer")
    noisy = cust.select(
        "c_nationkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(
                F.upper(F.substring("c_mktsegment", 1, 1)),
                F.lower(F.expr("substr(c_mktsegment, 2)")),
            ),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    folded = F.expr("seg COLLATE UTF8_LCASE")
    return noisy.groupBy("c_nationkey").agg(
        F.countDistinct("seg").alias("raw_variants"),
        F.countDistinct(folded).alias("folded_variants"),
        F.sum(F.when(folded == F.lit("machinery"), 1).otherwise(0)).alias(
            "n_machinery"
        ),
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (|>): Spark 4's linear query form. Same logical plan
# as the nested-SELECT equivalent — the oracle runs the classic form.
# ---------------------------------------------------------------------------
@query(
    "q_pipe_syntax_pricing",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavor written in Spark 4 pipe syntax.

    ``FROM … |> WHERE … |> EXTEND … |> AGGREGATE`` — each stage is a
    plain Catalyst operator, so pushdown and partial aggregation work
    exactly as in the nested form (the driver-checked plan equivalence
    IS the point of the query).
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(disc_price AS DECIMAL(30,6))) AS DOUBLE)
                   AS sum_disc_price
           GROUP BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: per-group top-1 without a window over the
# whole relation. Catalyst rewrites the lateral into a join; the oracle
# runs the identical LATERAL in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "q_lateral_topk_customers",
    sql="""
    SELECT n.n_name, t.c_name AS top_customer, t.c_acctbal AS top_acctbal
    FROM nation AS n,
         LATERAL (
             SELECT c_name, c_acctbal
             FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             LIMIT 1
         ) AS t
    """,
)
def q_lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest customer per nation via a LATERAL correlated subquery.

    Deterministic tiebreak on c_custkey. Nations with no customers drop
    out (inner lateral) — identical semantics in both engines.
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name AS top_customer, t.c_acctbal AS top_acctbal
        FROM lat_nation AS n,
             LATERAL (
                 SELECT c_name, c_acctbal
                 FROM lat_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 LIMIT 1
             ) AS t
        """
    )


# ---------------------------------------------------------------------------
# SQL session variables + named parameter markers (Spark 4 surface):
# DECLARE VARIABLE holds a data-derived scalar across statements, and
# the analysis query binds a named :mult parameter via spark.sql(...,
# args=...) — the session-scripting workflow (compute a threshold once,
# reuse it in parameterized statements) without any driver-side value
# round-trip. The oracle inlines the variable as a CTE scalar and the
# parameter as a literal; the threshold derives from the decimal-exact
# sum, so the > comparison is bit-identical in both engines.
# ---------------------------------------------------------------------------
SV_MULT = 1.25


def _isolated(spark: SparkSession) -> SparkSession:
    """A cloned session for queries that must mutate session state.

    ``newSession()`` shares the SparkContext (and the driver's
    builder-time confs) but has its own SessionState: temp views,
    DECLAREd variables, and ``spark.conf.set`` calls made on the clone
    never leak into the caller's session — and, critically, the
    returned lazy DataFrame carries the clone, so conf read at
    COLLECT time (e.g. cteRecursionRowLimit, which Spark reads at
    execution, verified empirically) still sees the lifted value. A
    try/finally restore on the shared session would instead re-trip
    the runaway guard when the driver collects after the function
    returns."""
    return spark.newSession()


@query(
    "q_session_variables",
    sql=f"""
    WITH stats AS (
        SELECT {dsum_sql('c_acctbal')} / COUNT(*) AS bal_mean FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           {dsum_sql('c_acctbal')} AS sum_bal
    FROM customer, stats
    WHERE c_acctbal > bal_mean * {SV_MULT}
    GROUP BY c_mktsegment
    """,
)
def q_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance census per market segment, threshold held in a SQL
    session variable and scaled by a named parameter marker.

    ``SET VAR`` evaluates the scalar subquery once (decimal-exact mean
    — Spark's BigDecimal→double cast is correctly rounded, matching the
    oracle's VARCHAR-routed cast); the parameterized statement then
    sees it as a constant, so Catalyst folds ``bal_mean * :mult`` into
    one literal comparison pushed to the scan.

    The whole statement sequence runs in a per-call cloned session
    (``_isolated``), so it never clobbers a caller's same-named view or
    variable and concurrent invocations cannot race on shared session
    state — no name-uniquifying counter needed."""
    sess = _isolated(spark)
    view, var = "sv_customer", "sv_bal_mean"
    table(sess, sf_dir, "customer").createOrReplaceTempView(view)
    sess.sql(f"DECLARE OR REPLACE VARIABLE {var} DOUBLE")
    sess.sql(
        f"SET VAR {var} = ("
        "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT(*) FROM {view})"
    )
    return sess.sql(
        f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_above,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                   AS sum_bal
        FROM {view}
        WHERE c_acctbal > {var} * :mult
        GROUP BY c_mktsegment
        """,
        args={"mult": SV_MULT},
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy walk to the root
# over the deterministic decimal-digit forest parent(c) = c div 10 —
# every customer walks O(log10 n) steps, so the recursion depth grows
# with the LOG of the scale factor (7 levels at sf100), and each
# iteration is one hash-join-free map step over the frontier. The
# per-depth census aggregates root ids and decimal-exact balances.
# ---------------------------------------------------------------------------
@query(
    "q_recursive_cte_hierarchy",
    sql=f"""
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS orig, c_custkey AS cur, 0 AS depth
        FROM customer
        UNION ALL
        SELECT orig, cur // 10, depth + 1 FROM walk WHERE cur >= 10
    ),
    fin AS (
        SELECT w.orig, w.cur AS root, w.depth, c.c_acctbal
        FROM walk w JOIN customer c ON c.c_custkey = w.orig
        WHERE w.cur < 10
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(root) AS BIGINT) AS sum_roots,
           {dsum_sql('c_acctbal')} AS sum_bal
    FROM fin GROUP BY 1
    """,
)
def q_recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _isolated(spark)
    view = "rcte_customer"
    table(sess, sf_dir, "customer").createOrReplaceTempView(view)
    # Spark guards recursive CTEs with a TOTAL-row runaway limit
    # (spark.sql.cteRecursionRowLimit, default 1e6) — the anchor alone
    # exceeds it at sf10 (1.5M customers; found by the native-sf10
    # sweep). This recursion provably terminates at depth
    # ceil(log10(max key)), so lift the guard to int-max; the LEVEL
    # limit (default 100) stays as the real runaway backstop. The lift
    # lives on the per-call clone only (see _isolated: conf is read at
    # collect time, so restoring it on a shared session would re-trip
    # the guard when the driver collects).
    sess.conf.set("spark.sql.cteRecursionRowLimit", str(2**31 - 1))
    return sess.sql(
        f"""
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS orig, c_custkey AS cur, 0 AS depth
            FROM {view}
            UNION ALL
            SELECT orig, cur div 10, depth + 1 FROM walk WHERE cur >= 10
        ),
        fin AS (
            SELECT w.orig, w.cur AS root, w.depth, c.c_acctbal
            FROM walk w JOIN {view} c ON c.c_custkey = w.orig
            WHERE w.cur < 10
        )
        SELECT depth,
               COUNT(*) AS n_customers,
               CAST(SUM(root) AS BIGINT) AS sum_roots,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                   AS sum_bal
        FROM fin GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4 BEGIN..END compound statements): an iterated
# data-derived threshold — three rounds of "mean of balances above the
# previous threshold" held in script variables across statements, the
# session-scripting workflow with NO driver-side value round-trip.
# Each mean is the decimal-exact sum / count (correctly-rounded double
# in both engines), so the iterated thresholds — and the final census —
# are bit-identical; the oracle unrolls the loop as three CTE stages.
# ---------------------------------------------------------------------------
def _thr_stage_sql(prev: str) -> str:
    return (
        f"SELECT {dsum_sql('c_acctbal')} / COUNT(c_acctbal) AS t "
        f"FROM customer WHERE c_acctbal > {prev}"
    )


@query(
    "q_sql_scripting_loop",
    sql=f"""
    WITH s1 AS ({_thr_stage_sql('0.0')}),
    s2 AS ({_thr_stage_sql('(SELECT t FROM s1)')}),
    s3 AS ({_thr_stage_sql('(SELECT t FROM s2)')})
    SELECT (SELECT t FROM s1) AS thr1,
           (SELECT t FROM s2) AS thr2,
           (SELECT t FROM s3) AS thr3,
           CAST(COUNT(*) AS BIGINT) AS n_above_final
    FROM customer WHERE c_acctbal > (SELECT t FROM s3)
    """,
)
def q_sql_scripting_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _isolated(spark)
    view = "script_customer"
    table(sess, sf_dir, "customer").createOrReplaceTempView(view)
    sess.conf.set("spark.sql.scripting.enabled", "true")
    mean_above = (
        "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT(c_acctbal) FROM {view} WHERE c_acctbal > "
    )
    return sess.sql(
        f"""
        BEGIN
          DECLARE thr1 DOUBLE DEFAULT 0.0;
          DECLARE thr2 DOUBLE DEFAULT 0.0;
          DECLARE thr3 DOUBLE DEFAULT 0.0;
          SET thr1 = ({mean_above} 0.0);
          SET thr2 = ({mean_above} thr1);
          SET thr3 = ({mean_above} thr2);
          SELECT thr1, thr2, thr3, COUNT(*) AS n_above_final
          FROM {view} WHERE c_acctbal > thr3;
        END
        """
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt): the wide→long reshape every metrics pipeline ends
# with. One hash-agg builds the wide per-lang row; unpivot is pure
# map-side row expansion (no shuffle) — the oracle mirrors it with the
# portable UNION ALL form.
# ---------------------------------------------------------------------------
@query(
    "q_unpivot_lang_metrics",
    sql="""
    WITH wide AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total_tokens
        FROM documents GROUP BY 1
    )
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM wide
    UNION ALL
    SELECT lang, 'total_chars', total_chars FROM wide
    UNION ALL
    SELECT lang, 'total_tokens', total_tokens FROM wide
    """,
)
def q_unpivot_lang_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_landmarks_datalake_spark.sources.catalog import compute_table

    docs = compute_table(spark, sf_dir, "documents")
    wide = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "total_tokens"
        ),
    )
    return wide.unpivot(
        "lang", ["n_docs", "total_chars", "total_tokens"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# approx_top_k (Spark 4.1, DataSketches frequent-items): the streaming
# heavy-hitters aggregate. Gate strategy follows the repo's sketch
# rule — compare an exactness REGIME bit-exactly: the corpus vocabulary
# (distinct space-split tokens) is far below maxItemsTracked, so the
# sketch never purges and every reported count is EXACT (frequent-items
# guarantees error <= n/maxItemsTracked, and zero purges make it 0);
# with k >= the vocabulary size the result is the complete exact word
# count, so the DuckDB oracle is a plain GROUP BY. Tie order inside
# the sketch's array is irrelevant: the result is exploded to rows and
# the driver compares sorted row sets.
#
# At 100 TB: ONE map-side-combinable sketch aggregation (fixed-size
# state per partition, merged once) — the shape that replaces a full
# groupBy when only the heavy hitters are needed.
# ---------------------------------------------------------------------------
TOPK_K = 64
TOPK_TRACKED = 1024


@query(
    "q_approx_top_k_terms",
    sql="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word != ''
    GROUP BY 1
    """,
)
def q_approx_top_k_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters via Spark 4.1's approx_top_k, in its
    provably-exact regime (vocabulary << maxItemsTracked, k >= vocab):
    the exploded (word, cnt) rows equal the exact word count."""
    from nyc_landmarks_datalake_spark.sources.catalog import compute_table

    docs = compute_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    sk = words.agg(
        F.expr(f"approx_top_k(word, {TOPK_K}, {TOPK_TRACKED})").alias("tk")
    )
    # exactness gate (zero extra passes): the sketch returning FEWER
    # than k items proves the vocabulary is < k <= maxItemsTracked, so
    # the sketch never purged and every count is exact and complete. A
    # full k-sized result is ambiguous (vocab could exceed k) — fail
    # loud instead of returning a silently-approximate answer the plain
    # GROUP-BY oracle would flag.
    gated = F.expr(
        f"CASE WHEN assert_true(size(tk) < {TOPK_K},"
        f" 'approx_top_k exactness regime violated: sketch returned a"
        f" full k={TOPK_K} items, vocabulary may exceed k') IS NULL"
        " THEN tk END"
    )
    return sk.select(F.explode(gated).alias("e")).select(
        F.col("e.item").alias("word"),
        F.col("e.count").cast("long").alias("cnt"),
    )
