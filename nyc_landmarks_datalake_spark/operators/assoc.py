"""Association-rule mining (market basket): co-purchase pair support
and lift over orders — the frequent-itemset tier of the analytics
surface, bounded and integer-exact.

Pair generation never explodes: an order carries 1-7 lineitems, so the
per-basket pair fan-out is at most C(7,2)=21 — the same bounded-basket
property real FP-growth preprocessing relies on (giant baskets get
capped upstream). Counts are distinct-order counts; lift is kept in
fixed point (10^6 * support * N // (c1 * c2)) so every emitted value
is a BIGINT both engines compute identically — no float ratios, no
log. int64 headroom: support*N*10^6 stays below 2^63 through sf100
for any support the top-k can surface.

Scale: one distinct (order, part) projection, one bounded self-join
per basket, two map-side-combinable counts, and a global top-k
(TakeOrdered — no full sort). The part-frequency join is
vocabulary-sized and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

LIFT_SCALE = 1_000_000
MIN_SUPPORT = 3
TOP_PAIRS = 30


@query(
    "q_copurchase_lift",
    sql=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
    c AS (SELECT p, COUNT(*) AS cnt FROM op GROUP BY 1),
    s AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MIN_SUPPORT}
    )
    SELECT p1, p2, support,
           CAST({LIFT_SCALE} * support * (SELECT n_orders FROM n)
                // (c1.cnt * c2.cnt) AS BIGINT) AS lift_e6,
           c1.cnt AS n_orders_p1, c2.cnt AS n_orders_p2
    FROM s JOIN c c1 ON c1.p = s.p1 JOIN c c2 ON c2.p = s.p2
    ORDER BY support DESC, p1 ASC, p2 ASC
    LIMIT {TOP_PAIRS}
    """,
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchase pairs by support, with fixed-point lift."""
    op = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = op.agg(F.countDistinct("o").alias("n_orders"))
    c = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.alias("a")
    b = op.alias("b")
    s = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    joined = (
        s.join(
            c.select(F.col("p").alias("p1"), F.col("cnt").alias("n_orders_p1")),
            "p1",
        )
        .join(
            c.select(F.col("p").alias("p2"), F.col("cnt").alias("n_orders_p2")),
            "p2",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        joined.select(
            "p1",
            "p2",
            "support",
            F.expr(
                f"CAST({LIFT_SCALE} AS BIGINT) * support * n_orders"
                " div (n_orders_p1 * n_orders_p2)"
            ).alias("lift_e6"),
            "n_orders_p1",
            "n_orders_p2",
        )
        .orderBy(F.col("support").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(TOP_PAIRS)
    )
