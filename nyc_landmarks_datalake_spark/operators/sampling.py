"""Deterministic sampling operators over ``documents`` — the
training-data-pipeline staples the reference's lake tier implies but
never implements (its analytics tier is delegated downstream,
SURVEY §0): stratified per-group sampling and a stable
train/validation/test split.

Spark's native ``df.sample`` / ``sampleBy`` draw from a seeded RNG whose
stream depends on partitioning, so results change under repartition and
can never match an external oracle. At scale the robust idiom — used
here — is HASH sampling: a record is selected iff a 60-bit md5-derived
integer of its stable key lands under a threshold. Properties that
matter at 100 TB:

- selection is a pure map-side predicate (codegen, pushable, no RNG
  state, no shuffle);
- the sample is stable under re-partitioning, retries, and incremental
  reruns (a re-ingested duplicate lands in the same split);
- per-stratum rates are just different thresholds on the same hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.hashing import md5_long, md5_long_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

#: per-mille sampling rate per language stratum (lang → keep if
#: hash‰ < rate); unlisted strata use DEFAULT_RATE.
STRATUM_RATES = {"en": 500, "de": 250, "fr": 250}
DEFAULT_RATE = 100

#: train/val/test per-mille cut points.
TRAIN_CUT, VAL_CUT = 800, 900


def _permille(key: Column) -> Column:
    """Uniform-ish value in [0, 1000) from a stable string key."""
    return md5_long(key) % 1000


def _permille_sql(expr: str) -> str:
    return f"({md5_long_sql(expr)} % 1000)"


def _rate_spark(col: str = "lang", rates: dict | None = None,
                default: int | None = None) -> Column:
    rates = STRATUM_RATES if rates is None else rates
    default = DEFAULT_RATE if default is None else default
    rate = F.lit(default)
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(col) == key, F.lit(r)).otherwise(rate)
    return rate


def _rate_sql(col: str = "lang", rates: dict | None = None,
              default: int | None = None) -> str:
    rates = STRATUM_RATES if rates is None else rates
    default = DEFAULT_RATE if default is None else default
    whens = " ".join(
        f"WHEN {col} = '{key}' THEN {r}" for key, r in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE {default} END)"


# ---------------------------------------------------------------------------
# Stratified sample: per-language rates, hash-thresholded.
# ---------------------------------------------------------------------------
@query(
    "q_stratified_sample",
    sql=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_permille_sql("CAST(doc_id AS VARCHAR)")} < {_rate_sql()}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    keep = _permille(F.col("doc_id").cast("string")) < _rate_spark()
    return docs.filter(keep).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Stable train/val/test split: per-(lang, split) census. The split
# column is a deterministic function of doc_id alone, so adding data
# never moves an existing document between splits.
# ---------------------------------------------------------------------------
@query(
    "q_train_test_split",
    sql=f"""
    SELECT lang,
           CASE WHEN pm < {TRAIN_CUT} THEN 'train'
                WHEN pm < {VAL_CUT} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, n_chars,
               {_permille_sql("CAST(doc_id AS VARCHAR)")} AS pm
        FROM documents
    )
    GROUP BY 1, 2
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pm = _permille(F.col("doc_id").cast("string"))
    split = (
        F.when(pm < TRAIN_CUT, "train").when(pm < VAL_CUT, "val").otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed token-budget bins in a
# stable order — the batch-construction step of an LLM training
# pipeline. bin = floor((running_total - n_tokens) / budget), i.e. a
# document starts a new bin when the budget would overflow mid-doc is
# allowed to straddle (greedy contiguous packing). The global running
# sum goes through distributed_running_sum (range partition + local
# running sum + broadcast prefix offsets), so no single-partition
# window touches the data at any scale.
# ---------------------------------------------------------------------------
PACK_BUDGET = 512  # whitespace tokens per bin


@query(
    "q_sequence_pack",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST((SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                   // {PACK_BUDGET} AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY 1
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_landmarks_datalake_spark.operators.windows import (
        distributed_running_sum,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    packed = distributed_running_sum(
        toks, ["doc_id"], "n_tokens", out_col="__running"
    ).withColumn(
        # integer `div`, not float floor-division: past 2^53 total
        # tokens a long->double rounding of the running sum could move
        # a boundary-adjacent doc into the wrong bin while the oracle's
        # exact BIGINT // stays put (same bug class as the trend-slope
        # int64 overflow — caught by review, fixed before it can bite)
        "bin_id",
        F.expr(f"(__running - n_tokens) div {PACK_BUDGET}"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Bottom-k sample: the k documents with the smallest md5 key-hashes — a
# deterministic fixed-SIZE uniform sample (hash-threshold sampling above
# fixes the RATE instead). Also the classic bottom-k sketch: two tables'
# bottom-k sets estimate their Jaccard overlap. One TakeOrdered-style
# global top-k, no full sort.
# ---------------------------------------------------------------------------
BOTTOM_K = 100


@query(
    "q_bottomk_sample",
    sql=f"""
    SELECT doc_id, h
    FROM (
        SELECT doc_id, {md5_long_sql("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    )
    ORDER BY h, doc_id
    LIMIT {BOTTOM_K}
    """,
)
def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", md5_long(F.col("doc_id").cast("string")).alias("h")
        )
        .orderBy("h", "doc_id")
        .limit(BOTTOM_K)
    )


# ---------------------------------------------------------------------------
# Weighted (per-stratum rate) sampling: each source gets its own keep
# rate — the downsample-the-big-domains / upsample-the-rare-ones step
# of corpus mixing. Same hash-threshold machinery as the uniform
# sample (partition-stable, reproducible, pushable), with the rate
# inlined as a CASE chain over the (tiny, fixed) source domain — at
# hundreds of sources switch to a broadcast-joined rate table instead
# of growing the expression tree.
# ---------------------------------------------------------------------------
SOURCE_RATES = {"src0": 250, "src1": 500, "src2": 750}  # permille
SOURCE_DEFAULT_RATE = 1000


@query(
    "q_weighted_sample",
    sql=f"""
    SELECT source, lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE {_permille_sql("CAST(doc_id AS VARCHAR)")} < {_rate_sql("source", SOURCE_RATES, SOURCE_DEFAULT_RATE)}
    GROUP BY 1, 2
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rate = _rate_spark("source", SOURCE_RATES, SOURCE_DEFAULT_RATE)
    return (
        docs.filter(_permille(F.col("doc_id").cast("string")) < rate)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
