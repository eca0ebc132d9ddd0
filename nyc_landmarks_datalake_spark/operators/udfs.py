"""UDF surface: scalar and grouped-aggregate pandas UDFs (Arrow-batched).

The engine's design rule is zero Python on hot paths (SCALING.md) — every
built-in-expressible operator uses JVM expressions. This module is the
sanctioned escape hatch, demonstrating the FAST flavor of custom code
(vectorized pandas_udf over Arrow batches, 10-100x row-at-a-time udf)
for logic that genuinely needs Python (model scoring, library calls).

The demo scalar UDF sticks to +,*,/ float64 ops so the DuckDB oracle
reproduces it bit-exactly — the pandas_udf execution path itself
(Arrow serialization, batch iteration, null handling) is then under the
correctness gate, not just eyeballed.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from nyc_landmarks_datalake_spark.operators.textops import STOPWORDS, _STOP_SQL
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table, table


# UDFs are built lazily: decorating at import time requires an active
# SparkContext (return-type resolution), and this module imports before
# any session exists (registry.load_all at driver-contract import).
@lru_cache(maxsize=1)
def quality_score():
    def _score(stop_ratio: pd.Series, ttr: pd.Series) -> pd.Series:
        """Vectorized quality score: weighted blend of stopword density
        and type-token ratio (exact arithmetic → oracle-mirrorable)."""
        return (2.0 * stop_ratio + ttr) / 3.0

    return pandas_udf(_score, returnType=T.DoubleType())


@lru_cache(maxsize=1)
def max_weighted_value():
    def _agg(value: pd.Series, weight: pd.Series) -> float:
        """Grouped-aggregate pandas UDF: max of value*weight per group.
        (max is accumulation-order independent, so the oracle matches
        bit-exactly — a float .sum() here would be numpy-pairwise and
        diverge from any sequential engine in the last ulps.)"""
        return float((value * weight).max())

    from pyspark.sql.functions import PandasUDFType

    return pandas_udf(
        _agg, returnType=T.DoubleType(), functionType=PandasUDFType.GROUPED_AGG
    )


@query(
    "q_pandas_udf_score",
    sql=f"""
    WITH feat AS (
        SELECT doc_id,
               (len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_SQL}))) * 1.0)
                   / len(string_split(text, ' ')) AS stop_ratio,
               (len(list_distinct(string_split(text, ' '))) * 1.0)
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    )
    SELECT doc_id, stop_ratio, ttr,
           (2.0 * stop_ratio + ttr) / 3.0 AS score
    FROM feat
    """,
)
def q_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    feat = docs.select(
        "doc_id",
        (F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))) * F.lit(1.0) / n).alias(
            "stop_ratio"
        ),
        (F.size(F.array_distinct(toks)) * F.lit(1.0) / n).alias("ttr"),
    )
    return feat.select(
        "doc_id",
        "stop_ratio",
        "ttr",
        quality_score()(F.col("stop_ratio"), F.col("ttr")).alias("score"),
    )


@query(
    "q_grouped_agg_udf",
    sql="""
    SELECT event_type,
           MAX(value * CAST(user_id + 1 AS DOUBLE)) AS max_weighted
    FROM events
    GROUP BY event_type
    """,
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.col("user_id") + 1).cast("double").alias("weight"),
    )
    return events.groupBy("event_type").agg(
        max_weighted_value()(F.col("value"), F.col("weight")).alias("max_weighted")
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 user-defined TABLE function), lateral-joined:
# one input row fans out to its top-K bigrams with deterministic
# (-count, bigram) ordering. This completes the Python API surface
# next to scalar/grouped-agg pandas UDFs and mapInPandas — a UDTF is
# the escape hatch for per-row table generation with nontrivial local
# state (here a counter + sort). Slow path by design (pinned in
# PYTHON_ALLOWED); the oracle recomputes the same top-K relationally.
# ---------------------------------------------------------------------------
UDTF_TOP_K = 3


@lru_cache(maxsize=1)
def top_bigrams_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string, cnt: bigint, rk: bigint")
    class TopBigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            counts: dict[str, int] = {}
            for a, b in zip(toks, toks[1:]):
                bg = f"{a} {b}"
                counts[bg] = counts.get(bg, 0) + 1
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for rk, (bg, cnt) in enumerate(ranked[:UDTF_TOP_K], start=1):
                yield bg, cnt, rk

    return TopBigrams


@query(
    "q_udtf_top_bigrams",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id % 20 = 0
    ),
    bigrams AS (
        SELECT doc_id, unnest(
            list_transform(
                list_zip(list_slice(t, 1, len(t) - 1), list_slice(t, 2, len(t))),
                p -> p[1] || ' ' || p[2]
            )
        ) AS bigram
        FROM toks
    ),
    counted AS (
        SELECT doc_id, bigram, COUNT(*) AS cnt FROM bigrams GROUP BY 1, 2
    )
    SELECT doc_id, bigram, cnt, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT doc_id, bigram, cnt,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, bigram
               ) AS rk
        FROM counted
    )
    WHERE rk <= {UDTF_TOP_K}
    """,
)
def q_udtf_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_landmarks_datalake_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("top_bigrams", top_bigrams_udtf())
    return spark.sql(
        "SELECT d.doc_id, b.bigram, b.cnt, b.rk "
        "FROM udtf_docs d, LATERAL top_bigrams(d.text) b"
    )


# ---------------------------------------------------------------------------
# Grouped-MAP pandas UDF (applyInPandas) — the remaining flavor of the
# pandas surface: each group arrives as one pandas DataFrame and
# returns a transformed frame. The demo assigns within-group ranks of
# o_totalprice (ties broken by o_orderkey, so the rank is a pure
# integer function of the data — nothing float to diverge on) and
# keeps only each group's top-N. The oracle is the equivalent
# ROW_NUMBER window, which checks the whole Arrow round-trip +
# group-split machinery bit-exactly.
#
# Scale: applyInPandas shuffles once on the group key and each group
# must fit in one executor's memory — the documented contract (use
# window functions when the logic is expressible; this query exists to
# pin the escape hatch, same rationale as the scalar UDF above).
# ---------------------------------------------------------------------------
GROUPED_MAP_TOP_N = 5


@query(
    "q_grouped_map_rank",
    sql=f"""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC)
                   AS rk
        FROM orders
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {GROUPED_MAP_TOP_N}
    """,
)
def q_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    schema = T.StructType(
        [
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("rk", T.LongType()),
        ]
    )

    def rank_top(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(GROUPED_MAP_TOP_N)
        out = out.assign(rk=range(1, len(out) + 1))
        return out

    return orders.groupBy("o_orderpriority").applyInPandas(rank_top, schema)


# ---------------------------------------------------------------------------
# mapInArrow: the zero-copy Arrow-native map surface — no pandas
# conversion at all (RecordBatch in, RecordBatch out). The right shape
# for per-batch logic that is itself vectorized (Arrow compute kernels,
# numpy views, handoff to native libs) where even the Arrow→pandas
# materialization of mapInPandas is waste.
# ---------------------------------------------------------------------------
@query(
    "q_arrow_map_counts",
    sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text) - length(replace(text, ' ', '')))
               AS BIGINT) AS n_spaces,
           CAST(SUM((length(text) - length(replace(text, 'data', ''))) // 4)
               AS BIGINT) AS n_data
    FROM documents
    GROUP BY source
    """,
)
def q_arrow_map_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source substring-occurrence totals through mapInArrow.

    The Python stage runs Arrow compute kernels (`count_substring`) on
    each RecordBatch — vectorized C++ under a Python driver loop, with
    no pandas materialization. Partial results are plain int64 columns
    the JVM aggregates afterward (map-side combine still applies). The
    oracle recomputes the counts with replace()-length arithmetic —
    'data' cannot self-overlap and ' ' is a single char, so
    non-overlapping substring counting agrees exactly.
    """
    docs = table(spark, sf_dir, "documents").select("source", "text")

    def count_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("source")),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                    pc.cast(pc.count_substring(text, "data"), pa.int64()),
                ],
                names=["source", "n_spaces", "n_data"],
            )

    mapped = docs.mapInArrow(
        count_batches, schema="source string, n_spaces long, n_data long"
    )
    return mapped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_spaces").alias("n_spaces"),
        F.sum("n_data").alias("n_data"),
    )
