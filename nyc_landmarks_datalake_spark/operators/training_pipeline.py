"""Training-data curation operators over ``documents``: benchmark
contamination checking, per-source (domain) corpus stats, global top
n-grams, composable quality filtering, deterministic per-group
sampling, and token-length histograms.

These are the curation steps an LLM data pipeline runs between raw
crawl and training batches (the reference stops at bronze→silver CSV
massage; SURVEY §2.B extends the surface). Design for 100 TB:

- contamination: benchmark shingle set is tiny (eval suites are KBs) →
  broadcast semi-join against the corpus's exploded shingles; the
  corpus never shuffles for the probe, only for the final census;
- per-source stats: one hash-agg; share-of-total windows over the
  aggregated (small) relation, never the raw table;
- top n-grams: explode → hash-agg (map-side combined) → global top-k
  (TakeOrderedAndProject — per-partition heaps, no full sort);
- quality filter: pure map-side higher-order functions, zero Python;
- per-group sample: md5-ranked row_number inside each group — one
  shuffle on the group key, deterministic under any partitioning
  (same rationale as hash-threshold sampling in sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.hashing import md5_long, md5_long_sql
from nyc_landmarks_datalake_spark.functions.numeric import davg_sql
from nyc_landmarks_datalake_spark.operators.dedup import _SHINGLED_DUCK, shingled
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table, table

#: deterministic stand-in for an eval/benchmark doc set (no eval suite
#: ships with the synthetic testdata): every 97th doc id.
BENCH_MOD = 97


# ---------------------------------------------------------------------------
# Benchmark contamination check: a training doc is contaminated if it
# shares any 3-gram shingle with a benchmark doc. The real-world use is
# decontaminating a crawl against eval suites (benchmarks are tiny, so
# their shingle set broadcasts; the 100 TB side only explodes map-side
# and semi-joins against the broadcast).
# ---------------------------------------------------------------------------
@query(
    "q_contamination_check",
    sql=f"""
    WITH sh AS ({_SHINGLED_DUCK}),
    bench_sh AS (
        SELECT DISTINCT unnest(shingles) AS shingle
        FROM sh WHERE doc_id % {BENCH_MOD} = 0
    ),
    train AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    hits AS (
        SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(shingles) AS shingle FROM train) t
        JOIN bench_sh USING (shingle)
    )
    SELECT d.lang,
           COUNT(*) AS n_train_docs,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
    FROM documents d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {BENCH_MOD} <> 0
    GROUP BY 1
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents")
    sh = shingled(docs, materialize=True)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_sh = (
        sh.filter(is_bench)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    hits = (
        sh.filter(~is_bench)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(~is_bench)
        .join(hits.withColumn("hit", F.lit(1)), "doc_id", "left_outer")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source ("domain") corpus stats with share-of-corpus: the standard
# crawl-composition report (and the input to per-domain caps/reweighting).
# ---------------------------------------------------------------------------
@query(
    "q_source_stats",
    sql=f"""
    WITH per AS (
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               {davg_sql('n_chars')} AS avg_chars
        FROM documents GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, total_chars, avg_chars,
           (n_docs * 1.0) / SUM(n_docs) OVER () AS doc_share
    FROM per
    """,
)
def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_landmarks_datalake_spark.functions.numeric import davg

    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        davg(F.col("n_chars")).alias("avg_chars"),
    )
    # window over the aggregated (sources x langs) relation, not the corpus
    w_all = Window.partitionBy()
    return per.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "avg_chars",
        (F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(w_all)).alias(
            "doc_share"
        ),
    )


# ---------------------------------------------------------------------------
# Global top-20 trigrams by document frequency: explode distinct
# shingles per doc, hash-agg, TakeOrdered top-k (ties broken by the
# shingle text so both engines agree).
# ---------------------------------------------------------------------------
TOP_NGRAMS_K = 20


@query(
    "q_top_ngrams",
    sql=f"""
    WITH sh AS ({_SHINGLED_DUCK})
    SELECT shingle, COUNT(*) AS df
    FROM (SELECT unnest(shingles) AS shingle FROM sh)
    GROUP BY 1
    ORDER BY df DESC, shingle
    LIMIT {TOP_NGRAMS_K}
    """,
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingled(compute_table(spark, sf_dir, "documents"), materialize=True)
    return (
        sh.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(TOP_NGRAMS_K)
    )


# ---------------------------------------------------------------------------
# Composable quality filter (C4/Gopher-style rules, all map-side):
# length bounds, mean token length, stopword ratio, distinct-token
# ratio. Output is the per-(lang, verdict) census a pipeline uses to
# tune thresholds before applying the keep-predicate.
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "to", "and", "in")
MIN_CHARS, MAX_CHARS = 50, 5000
MIN_MEAN_TOK, MAX_MEAN_TOK = 2.0, 10.0
MIN_STOPWORD_RATIO = 0.01
MIN_DISTINCT_RATIO = 0.2

_STOP_SET_SQL = "(" + ", ".join(f"'{s}'" for s in _STOPWORDS) + ")"


@query(
    "q_quality_filter",
    sql=f"""
    WITH feats AS (
        SELECT lang, n_chars,
               len(toks) AS n_toks,
               (list_sum(list_transform(toks, t -> len(t))) * 1.0) / len(toks)
                   AS mean_tok_len,
               (len(list_filter(toks, t -> t IN {_STOP_SET_SQL})) * 1.0) / len(toks)
                   AS stop_ratio,
               (len(list_distinct(toks)) * 1.0) / len(toks) AS distinct_ratio
        FROM (SELECT lang, n_chars, string_split(text, ' ') AS toks FROM documents)
    )
    SELECT lang,
           CASE
             WHEN n_chars < {MIN_CHARS} OR n_chars > {MAX_CHARS} THEN 'drop_length'
             WHEN mean_tok_len < {MIN_MEAN_TOK} OR mean_tok_len > {MAX_MEAN_TOK}
                 THEN 'drop_token_len'
             WHEN stop_ratio < {MIN_STOPWORD_RATIO} THEN 'drop_stopwords'
             WHEN distinct_ratio < {MIN_DISTINCT_RATIO} THEN 'drop_repetition'
             ELSE 'keep'
           END AS verdict,
           COUNT(*) AS n_docs
    FROM feats
    GROUP BY 1, 2
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    mean_tok_len = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        )
        * F.lit(1.0)
        / n_toks
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) * F.lit(1.0) / n_toks
    )
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_toks
    verdict = (
        F.when(
            (F.col("n_chars") < MIN_CHARS) | (F.col("n_chars") > MAX_CHARS),
            "drop_length",
        )
        .when(
            (mean_tok_len < MIN_MEAN_TOK) | (mean_tok_len > MAX_MEAN_TOK),
            "drop_token_len",
        )
        .when(stop_ratio < MIN_STOPWORD_RATIO, "drop_stopwords")
        .when(distinct_ratio < MIN_DISTINCT_RATIO, "drop_repetition")
        .otherwise("keep")
    )
    return (
        docs.select("lang", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Deterministic k-per-group sample: md5-ranked row_number inside each
# group. Unlike rand()-based sampling this is stable under any
# partitioning/retry (the property a reproducible data pipeline needs)
# and both engines rank the same hex strings.
# ---------------------------------------------------------------------------
SAMPLE_PER_GROUP = 5


@query(
    "q_sample_per_group",
    sql=f"""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    WHERE rk <= {SAMPLE_PER_GROUP}
    """,
)
def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= SAMPLE_PER_GROUP)
    )


# ---------------------------------------------------------------------------
# Token-length histogram per lang (bucket = 32 tokens): the
# length-distribution report that drives sequence-length planning.
# ---------------------------------------------------------------------------
TOKEN_BUCKET = 32


@query(
    "q_token_len_histogram",
    sql=f"""
    SELECT lang,
           CAST(len(string_split(text, ' ')) // {TOKEN_BUCKET} AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select("lang", F.floor(n_toks / TOKEN_BUCKET).alias("bucket"),
                    n_toks.alias("n_toks"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top term per document. The idf here is the RATIONAL form
# N/df (not ln(N/df)): natural log is not guaranteed bit-identical
# between Java and C libms, and the oracle gate hashes values — the
# rational form preserves the exact same term ranking for a fixed
# document (tf * N/df is monotone in tf/df) while staying
# cross-engine exact (one IEEE multiply + divide on integer-derived
# doubles). Shape: explode → two hash-aggs (term df, per-doc tf) →
# broadcast the (small) df table → top-1 per doc via row_number.
# ---------------------------------------------------------------------------
@query(
    "q_tfidf_top_term",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               (tf.tf * 1.0) * ((SELECT n_docs FROM n) * 1.0 / df.df) AS score
        FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term AS top_term, score
    FROM (
        SELECT doc_id, term, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS rk
        FROM scored
    )
    WHERE rk = 1
    """,
)
def q_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents")
    # lazy checkpoint: the tf and df branches both consume the exploded
    # terms — materialize once (and avoid GenerateExec re-evaluating
    # the split per generated row; see shingled())
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).localCheckpoint(eager=False)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # no broadcast hint on df: a web-scale vocabulary is heavy-tailed and
    # unbounded, so the term-df table must be allowed to shuffle-join;
    # Catalyst still auto-broadcasts it under the size threshold
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * F.lit(1.0)
                * (F.col("n_docs") * F.lit(1.0) / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "score")
    )


# ---------------------------------------------------------------------------
# End-to-end curation census: the composed deliverable of the pipeline —
# quality filter + exact dedup + benchmark decontamination applied
# together, reporting how many docs each stage removes per lang. This
# is the acceptance report a 100 TB curation run produces; stages
# compose as independent map-side/broadcast predicates so the corpus
# is scanned once.
# ---------------------------------------------------------------------------
@query(
    "q_curation_census",
    sql=f"""
    WITH sh AS ({_SHINGLED_DUCK}),
    bench_sh AS (
        SELECT DISTINCT unnest(shingles) AS shingle
        FROM sh WHERE doc_id % {BENCH_MOD} = 0
    ),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh
              WHERE doc_id % {BENCH_MOD} <> 0) t
        JOIN bench_sh USING (shingle)
    ),
    dup AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY md5(text) ORDER BY doc_id
                   ) AS rk
            FROM documents
        ) WHERE rk > 1
    ),
    staged AS (
        SELECT d.lang,
               CASE
                 WHEN d.doc_id % {BENCH_MOD} = 0 THEN 'benchmark'
                 WHEN d.n_chars < {MIN_CHARS} OR d.n_chars > {MAX_CHARS}
                     THEN 'drop_quality'
                 WHEN dup.doc_id IS NOT NULL THEN 'drop_duplicate'
                 WHEN c.doc_id IS NOT NULL THEN 'drop_contaminated'
                 ELSE 'keep'
               END AS stage
        FROM documents d
        LEFT JOIN dup ON d.doc_id = dup.doc_id
        LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    )
    SELECT lang, stage, COUNT(*) AS n_docs
    FROM staged GROUP BY 1, 2
    """,
)
def q_curation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents")
    sh = shingled(docs, materialize=True)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_sh = (
        sh.filter(is_bench)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    contaminated = (
        sh.filter(~is_bench)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    w_dup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dup = (
        docs.withColumn("rk", F.row_number().over(w_dup))
        .filter(F.col("rk") > 1)
        .select("doc_id")
        .withColumn("is_dup", F.lit(1))
    )
    stage = (
        F.when(is_bench, "benchmark")
        .when(
            (F.col("n_chars") < MIN_CHARS) | (F.col("n_chars") > MAX_CHARS),
            "drop_quality",
        )
        .when(F.col("is_dup").isNotNull(), "drop_duplicate")
        .when(F.col("is_cont").isNotNull(), "drop_contaminated")
        .otherwise("keep")
    )
    # dup and contaminated grow with the corpus (duplicates are a large
    # fraction of any real crawl) — no broadcast hint; only the
    # benchmark shingle set above is bounded enough to broadcast
    return (
        docs.join(dup, "doc_id", "left_outer")
        .join(contaminated, "doc_id", "left_outer")
        .select("lang", stage.alias("stage"))
        .groupBy("lang", "stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing: the batch-composition step that
# up-samples small domains and down-samples huge ones (alpha=0.5, the
# "temperature" of multinomial sampling in multilingual/multi-domain
# training). Weights use INTEGER floor-sqrt and integer division so the
# whole computation is bit-exact across engines — production would
# float-normalize, but floor(sqrt(bigint)) is IEEE-identical in Spark
# and DuckDB while a float SUM's addend order is not. One hash-agg over
# the corpus; the weight normalization windows over the 20-row
# aggregated relation (SinglePartition on summaries only — the pinned
# pattern).
# ---------------------------------------------------------------------------
EPOCH_BUDGET = 1_000_000  # documents per training epoch across sources


@query(
    "q_mixture_weights",
    sql=f"""
    WITH per_src AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(FLOOR(SQRT(SUM(n_chars))) AS BIGINT) AS mix_weight
        FROM documents GROUP BY 1
    )
    SELECT source, n_docs, total_chars, mix_weight,
           CAST(({EPOCH_BUDGET} * mix_weight)
                // SUM(mix_weight) OVER () AS BIGINT) AS target_docs
    FROM per_src
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.floor(F.sqrt(F.sum("n_chars"))).cast("long").alias("mix_weight"),
    )
    total_w = F.sum("mix_weight").over(Window.partitionBy())
    return per_src.withColumn("__total_w", total_w).select(
        "source",
        "n_docs",
        "total_chars",
        "mix_weight",
        F.expr(f"({EPOCH_BUDGET}L * mix_weight) div __total_w")
        .cast("long")
        .alias("target_docs"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals: the fraction of a document made of
# REPEATED bigrams is a strong boilerplate/spam indicator (Rae et al.
# 2021 use duplicate n-gram character fractions). Pure higher-order
# array functions — zero Python, zero explode: each doc reduces to two
# integers map-side, then one hash-agg per (lang, source). All outputs
# integral, so parity is bit-exact by construction.
# ---------------------------------------------------------------------------
@query(
    "q_repetition_signals",
    sql="""
    WITH feats AS (
        SELECT lang, source,
               len(bigrams) AS n_bi,
               len(bigrams) - len(list_distinct(bigrams)) AS dup_bi
        FROM (
            SELECT lang, source,
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i+1]) AS bigrams
            FROM (SELECT lang, source, string_split(text, ' ') AS toks
                  FROM documents)
        )
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bi) AS BIGINT) AS total_bigrams,
           CAST(SUM(dup_bi) AS BIGINT) AS dup_bigrams,
           CAST(SUM(CASE WHEN 5 * dup_bi > n_bi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
    FROM feats GROUP BY 1, 2
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # zip(toks[0:n-1], toks[1:n-1]) -> n-1 bigrams; split never yields an
    # empty array so size-1 >= 0 and slice is well-defined
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = docs.select(
        "lang",
        "source",
        F.size(bigrams).alias("n_bi"),
        (F.size(bigrams) - F.size(F.array_distinct(bigrams))).alias("dup_bi"),
    )
    return feats.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bi").cast("long").alias("total_bigrams"),
        F.sum("dup_bi").cast("long").alias("dup_bigrams"),
        F.sum(F.when(5 * F.col("dup_bi") > F.col("n_bi"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
    )


# ---------------------------------------------------------------------------
# Document chunking: overlapping token windows (the sequence-prep step
# between curation and packing — long documents become training-length
# pieces with CHUNK_W-CHUNK_S tokens of overlap so no boundary context
# is lost). Pure map-side: split once, checkpoint the computed token
# array (GenerateExec re-evaluates its child during generation — the
# explode-over-computed-input trap), then explode only the tiny start
# offsets and slice. No shuffle at all — at 100 TB chunking is a
# zero-exchange stage fused into the scan.
# ---------------------------------------------------------------------------
CHUNK_W = 32  # tokens per chunk
CHUNK_S = 24  # stride (overlap = CHUNK_W - CHUNK_S)


@query(
    "q_doc_chunks",
    sql=f"""
    WITH ctoks AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    cstarts AS (
        SELECT doc_id, toks,
               CAST(unnest(range(0, n, {CHUNK_S})) AS BIGINT) AS start
        FROM ctoks
    )
    SELECT doc_id,
           CAST(start // {CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, start + 1, start + {CHUNK_W})) AS BIGINT)
               AS n_tokens,
           {md5_long_sql(
               "array_to_string(list_slice(toks, start + 1, start + "
               + str(CHUNK_W) + "), ' ')"
           )} AS chunk_hash
    FROM cstarts
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    ).localCheckpoint(eager=False)
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_S))
        ).alias("start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK_W))
    return chunks.select(
        "doc_id",
        (F.col("start") / CHUNK_S).cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_tokens"),
        md5_long(F.array_join(piece, " ")).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Curriculum mixing schedule: per-epoch source sampling weights that
# interpolate from a uniform mixture (epoch 0 — maximum diversity early
# in training) to a size-proportional mixture (final epoch — match the
# natural distribution once the model is past the memorization-prone
# phase). The standard data-curriculum shape (anneal the mixture, not
# the data); every weight is fixed-point ppm integer arithmetic so the
# whole schedule sits under the bit-exact oracle gate.
#
# Scale: one tiny per-source aggregate (N_sources rows) cross-joined
# with an N_EPOCHS literal spine — the 100 TB input reduces map-side to
# one row per source before any schedule math happens; the schedule
# itself is metadata-sized and broadcastable to whatever sampler
# consumes it.
# ---------------------------------------------------------------------------
N_EPOCHS = 4
PPM = 1_000_000


@query(
    "q_curriculum_schedule",
    sql=f"""
    WITH per_src AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1
    ),
    base AS (
        SELECT source, n_docs, total_chars,
               {PPM} // COUNT(*) OVER () AS uniform_ppm,
               CAST(({PPM} * CAST(total_chars AS HUGEINT))
                   // SUM(CAST(total_chars AS HUGEINT)) OVER ()
                   AS BIGINT) AS natural_ppm
        FROM per_src
    )
    SELECT epoch, source, n_docs,
           CAST(uniform_ppm AS BIGINT) AS uniform_ppm,
           CAST(natural_ppm AS BIGINT) AS natural_ppm,
           CAST((({N_EPOCHS - 1} - epoch) * uniform_ppm
                 + epoch * natural_ppm) // {N_EPOCHS - 1} AS BIGINT)
               AS weight_ppm,
           CAST(({EPOCH_BUDGET} * ((({N_EPOCHS - 1} - epoch) * uniform_ppm
                                    + epoch * natural_ppm)
                                   // {N_EPOCHS - 1})) // {PPM} AS BIGINT)
               AS target_docs
    FROM base
    CROSS JOIN (SELECT unnest(range({N_EPOCHS})) AS epoch)
    """,
)
def q_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    # the unpartitioned windows run over N_sources rows (the already-
    # reduced per-source frame), not raw documents — metadata-sized
    base = per_src.select(
        "source",
        "n_docs",
        "total_chars",
        F.expr(f"{PPM} div count(*) over ()").alias("uniform_ppm"),
        # PPM * total_chars overflows int64 once a source holds ~9e12
        # chars (~9 TB of text — routine at the 100 TB posture); route
        # the product and the window sum through DECIMAL(38,0) / int128
        # like the trend-slope sufficient statistics (both operands
        # positive, so Spark's `div` and DuckDB's `//` truncation agree)
        F.expr(
            f"({PPM} * cast(total_chars as decimal(20,0)))"
            " div sum(cast(total_chars as decimal(20,0))) over ()"
        ).alias("natural_ppm"),
    )
    epochs = spark.range(N_EPOCHS).select(F.col("id").alias("epoch"))
    sched = base.crossJoin(F.broadcast(epochs))
    mix_sql = (
        f"((({N_EPOCHS - 1} - epoch) * uniform_ppm"
        f" + epoch * natural_ppm) div {N_EPOCHS - 1})"
    )
    return sched.select(
        "epoch",
        "source",
        "n_docs",
        F.col("uniform_ppm").cast("long").alias("uniform_ppm"),
        F.col("natural_ppm").cast("long").alias("natural_ppm"),
        F.expr(mix_sql).cast("long").alias("weight_ppm"),
        F.expr(f"({EPOCH_BUDGET}L * {mix_sql}) div {PPM}")
        .cast("long")
        .alias("target_docs"),
    )


# ---------------------------------------------------------------------------
# Per-source loss-weight planning: temperature-scaled sampling
# probabilities p_i ∝ (n_i/N)^alpha with alpha=0.5 (the multilingual
# pre-training standard — up-weights small sources without letting any
# source dominate), plus the per-example LOSS weight that keeps the
# expected gradient unbiased under that sampling: loss_w_i =
# natural_p_i / sampled_p_i. sqrt(BIGINT) is the same float64 in both
# engines; the normalizing sum routes through DECIMAL(30,6) (dsum) so
# every derived float is bit-identical.
# ---------------------------------------------------------------------------
@query(
    "q_loss_weight_plan",
    sql="""
    WITH per_lang AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ),
    scored AS (
        SELECT lang, n_docs,
               SQRT(CAST(n_docs AS DOUBLE)) AS s
        FROM per_lang
    ),
    norm AS (
        SELECT lang, n_docs, s,
               CAST(CAST(SUM(CAST(s AS DECIMAL(30,6))) OVER ()
                         AS VARCHAR) AS DOUBLE) AS total_s,
               CAST(SUM(n_docs) OVER () AS BIGINT) AS total_n
        FROM scored
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           s / total_s AS sample_p,
           (CAST(n_docs AS DOUBLE) / total_n) / (s / total_s) AS loss_w
    FROM norm
    """,
)
def q_loss_weight_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    s = F.sqrt(F.col("n_docs").cast("double"))
    w = Window.partitionBy()
    scored = per_lang.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        s.alias("s"),
        # exact decimal normalizer — summing a handful of doubles is
        # still order-dependent; the (30,6) round-trip pins it
        F.sum(s.cast("decimal(30,6)")).over(w).cast("double").alias("total_s"),
        F.sum("n_docs").over(w).cast("long").alias("total_n"),
    )
    sample_p = F.col("s") / F.col("total_s")
    natural_p = F.col("n_docs").cast("double") / F.col("total_n")
    return scored.select(
        "lang",
        "n_docs",
        sample_p.alias("sample_p"),
        (natural_p / sample_p).alias("loss_w"),
    )


# ---------------------------------------------------------------------------
# The composed end-to-end curation pipeline — the shape a 100 TB run
# actually executes, as ONE query: raw documents → quality filter
# (C4/Gopher rules) → repetition filter (sorted-run fold) → per-domain
# LSH dedup cascade (hard drop, keep-lowest-doc_id) → exact-dup soft
# weights over the SURVIVORS (1e6/cluster ppm) → temperature mixture →
# per-epoch doc targets. Every stage operates on the previous stage's
# survivors, so stage-interaction bugs (filter-order sensitivity, hot-
# shingle df computed on the wrong corpus, weight double-counting) are
# exactly what the oracle recomputation catches — the per-stage pieces
# are all green individually; this pins their composition.
#
# Scale notes: stages A/B are pure map-side; the cascade's one shuffle
# is co-partitioned by (source, band) over the FILTERED corpus (smaller
# than the raw corpus — filter order matters for cost too); the weight
# stage shuffles once on the 128-bit digest; the mixture windows over
# the 20-row per-source aggregate (the pinned SinglePartition-on-
# summaries pattern). eff_chars headroom: n_chars<=5000 x ppm<=1e6 →
# 5e9/doc, int64-safe through ~sf10000.
# ---------------------------------------------------------------------------
def _e2e_parts():
    from nyc_landmarks_datalake_spark.operators.dedup import (
        domain_dedup_ctes_sql,
        domain_dedup_edges,
    )
    from nyc_landmarks_datalake_spark.operators.textops import (
        REP2_MAX_PPM,
        REP3_MAX_PPM,
        rep_metrics,
        rep_metrics_ctes_sql,
    )

    return (
        domain_dedup_ctes_sql,
        domain_dedup_edges,
        REP2_MAX_PPM,
        REP3_MAX_PPM,
        rep_metrics,
        rep_metrics_ctes_sql,
    )


def _register_e2e() -> None:
    (
        domain_dedup_ctes_sql,
        domain_dedup_edges,
        REP2_MAX_PPM,
        REP3_MAX_PPM,
        rep_metrics,
        rep_metrics_ctes_sql,
    ) = _e2e_parts()

    quality_keep_sql = f"""
        n_chars >= {MIN_CHARS} AND n_chars <= {MAX_CHARS}
        AND mean_tok_len >= {MIN_MEAN_TOK} AND mean_tok_len <= {MAX_MEAN_TOK}
        AND stop_ratio >= {MIN_STOPWORD_RATIO}
        AND distinct_ratio >= {MIN_DISTINCT_RATIO}"""

    @query(
        "q_curation_pipeline_e2e",
        sql=f"""
        WITH docs0 AS (
            SELECT doc_id, source, text, n_chars FROM documents
        ),
        qfeat AS (
            SELECT doc_id, source, text, n_chars,
                   (list_sum(list_transform(toks, t -> len(t))) * 1.0)
                       / len(toks) AS mean_tok_len,
                   (len(list_filter(toks, t -> t IN {_STOP_SET_SQL})) * 1.0)
                       / len(toks) AS stop_ratio,
                   (len(list_distinct(toks)) * 1.0) / len(toks)
                       AS distinct_ratio
            FROM (SELECT doc_id, source, text, n_chars,
                         string_split(text, ' ') AS toks FROM docs0)
        ),
        qkeep AS (
            SELECT doc_id, source, text, n_chars FROM qfeat
            WHERE {quality_keep_sql}
        ),
        {rep_metrics_ctes_sql('qkeep', ['doc_id', 'source', 'text', 'n_chars'])},
        rkeep AS (
            SELECT doc_id, source, text, n_chars FROM rm
            WHERE dup2_ppm <= {REP2_MAX_PPM} AND dup3_ppm <= {REP3_MAX_PPM}
        ),
        {domain_dedup_ctes_sql('rkeep')},
        drops AS (SELECT DISTINCT doc2 AS doc_id FROM dver),
        kept AS (
            SELECT r.doc_id, r.source, r.n_chars,
                   {md5_long_sql('r.text')} AS h
            FROM rkeep r LEFT JOIN drops d USING (doc_id)
            WHERE d.doc_id IS NULL
        ),
        cnts AS (SELECT h, COUNT(*) AS c FROM kept GROUP BY 1),
        wts AS (
            SELECT source, n_chars, c, 1000000 // c AS weight_ppm
            FROM kept JOIN cnts USING (h)
        ),
        rawc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
                 FROM docs0 GROUP BY 1),
        qc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality
               FROM qkeep GROUP BY 1),
        rc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rep
               FROM rkeep GROUP BY 1),
        ks AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_downweighted,
                   CAST(SUM(weight_ppm) AS BIGINT) AS sum_weight_ppm,
                   CAST(SUM(n_chars * weight_ppm) AS BIGINT) AS eff_chars
            FROM wts GROUP BY 1
        ),
        fin AS (
            SELECT r.source, r.n_raw,
                   CAST(COALESCE(q.n_quality, 0) AS BIGINT) AS n_quality,
                   CAST(COALESCE(c.n_rep, 0) AS BIGINT) AS n_rep,
                   CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(COALESCE(k.n_downweighted, 0) AS BIGINT)
                       AS n_downweighted,
                   CAST(COALESCE(k.sum_weight_ppm, 0) AS BIGINT)
                       AS sum_weight_ppm,
                   CAST(COALESCE(k.eff_chars, 0) AS BIGINT) AS eff_chars,
                   CAST(FLOOR(SQRT(COALESCE(k.eff_chars, 0))) AS BIGINT)
                       AS mix_weight
            FROM rawc r
            LEFT JOIN qc q USING (source)
            LEFT JOIN rc c USING (source)
            LEFT JOIN ks k USING (source)
        )
        SELECT source, n_raw, n_quality, n_rep, n_kept, n_downweighted,
               sum_weight_ppm, eff_chars, mix_weight,
               CAST(({EPOCH_BUDGET} * mix_weight)
                    // SUM(mix_weight) OVER () AS BIGINT) AS target_docs
        FROM fin
        """,
    )
    def q_curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = compute_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text", "n_chars"
        )
        toks = F.split(F.col("text"), " ")
        n_toks = F.size(toks)
        mean_tok_len = (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0),
                lambda a, x: a + x,
            )
            * F.lit(1.0)
            / n_toks
        )
        stop_ratio = (
            F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
            * F.lit(1.0)
            / n_toks
        )
        distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_toks
        qkeep = (
            (F.col("n_chars") >= MIN_CHARS)
            & (F.col("n_chars") <= MAX_CHARS)
            & (mean_tok_len >= MIN_MEAN_TOK)
            & (mean_tok_len <= MAX_MEAN_TOK)
            & (stop_ratio >= MIN_STOPWORD_RATIO)
            & (distinct_ratio >= MIN_DISTINCT_RATIO)
        )
        q = docs.filter(qkeep)
        # checkpoint the per-doc repetition metrics ONCE: the quality
        # census (n_quality == m's row count) and the repetition
        # survivors both derive from it, so the quality HOF pass runs a
        # single time over the corpus
        m = rep_metrics(q, ["doc_id", "source", "text", "n_chars"])
        m = m.localCheckpoint(eager=False)
        r = m.filter(
            (F.col("dup2_ppm") <= REP2_MAX_PPM)
            & (F.col("dup3_ppm") <= REP3_MAX_PPM)
        ).select("doc_id", "source", "text", "n_chars")
        _cand, ver = domain_dedup_edges(r)
        drops = ver.select(F.col("doc2").alias("doc_id")).distinct()
        kept = (
            r.join(drops, "doc_id", "left_anti")
            .select(
                "doc_id", "source", "n_chars", md5_long(F.col("text")).alias("h")
            )
            .localCheckpoint(eager=False)
        )
        cnts = kept.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
        wts = kept.join(cnts, "h").selectExpr(
            "source",
            "n_chars",
            "c",
            "CAST(1000000 div c AS BIGINT) AS weight_ppm",
        )
        rawc = docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_raw")
        )
        qc = m.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_quality")
        )
        rc = r.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_rep")
        )
        ks = wts.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum((F.col("c") > 1).cast("int"))
            .cast("long")
            .alias("n_downweighted"),
            F.sum("weight_ppm").cast("long").alias("sum_weight_ppm"),
            F.sum(F.col("n_chars").cast("long") * F.col("weight_ppm"))
            .cast("long")
            .alias("eff_chars"),
        )
        z = F.lit(0).cast("long")
        fin = (
            rawc.join(qc, "source", "left")
            .join(rc, "source", "left")
            .join(ks, "source", "left")
            .select(
                "source",
                "n_raw",
                F.coalesce(F.col("n_quality"), z).alias("n_quality"),
                F.coalesce(F.col("n_rep"), z).alias("n_rep"),
                F.coalesce(F.col("n_kept"), z).alias("n_kept"),
                F.coalesce(F.col("n_downweighted"), z).alias("n_downweighted"),
                F.coalesce(F.col("sum_weight_ppm"), z).alias("sum_weight_ppm"),
                F.coalesce(F.col("eff_chars"), z).alias("eff_chars"),
                F.floor(F.sqrt(F.coalesce(F.col("eff_chars"), z)))
                .cast("long")
                .alias("mix_weight"),
            )
        )
        total_w = F.sum("mix_weight").over(Window.partitionBy())
        return fin.withColumn("__total_w", total_w).select(
            "source",
            "n_raw",
            "n_quality",
            "n_rep",
            "n_kept",
            "n_downweighted",
            "sum_weight_ppm",
            "eff_chars",
            "mix_weight",
            F.expr(f"({EPOCH_BUDGET}L * mix_weight) div __total_w")
            .cast("long")
            .alias("target_docs"),
        )


_register_e2e()
