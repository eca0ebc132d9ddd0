"""Exact-substring (span-level) duplication census via content-defined
anchors — the scalable stand-in for suffix-array substring dedup from
the training-data literature (cf. "Deduplicating Training Data Makes
Language Models Better": long verbatim substrings shared across
documents are removed span-wise; document-level MinHash/Jaccard cannot
see them).

A distributed suffix array is disproportionate for an analytics
engine. The standard scalable substitute is *content-defined* span
sampling (winnowing / CDC anchoring): a position p is an anchor iff
the hash of the k-char gram starting at p satisfies ``h % D == 0``.
Because anchoring depends only on the text itself, two documents
sharing a verbatim run select the SAME anchor positions inside that
run — no stride-alignment phase problem (a fixed-stride sampler only
detects duplicates whose alignment phases happen to match; the
content-defined sampler is alignment-independent by construction).
Any shared run of length >= W + g chars containing an anchor in its
first g+1 positions is detected; anchors fire at expected density
1/D, so detection of runs >= W + O(D) chars is near-certain and fully
deterministic (both engines compute the same md5 anchors).

Scale posture: position explosion is a row-local Generate over a
cheap ``sequence`` array (the GenerateExec re-evaluation trap in
STATUS.md applies only to expensive computed arrays); anchor selection
is a map-side filter that discards (D-1)/D of positions BEFORE any
shuffle; the inverted index is one hash-agg on the 60-bit span hash;
duplicate attribution is one hash join. No pair expansion anywhere —
this is a census; a removal pass would reuse dedup.py's df-cap
pattern. At 100 TB the post-filter span relation is ~doc_bytes/D rows
of (int64, int64), map-side generated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.hashing import md5_long, md5_long_sql
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table

#: span width W, anchor-gram width K, anchor density divisor D
SPAN_W, ANCHOR_K, ANCHOR_D = 40, 8, 16


@query(
    "q_substring_dup_spans",
    sql=f"""
    WITH docs AS (
        SELECT doc_id, source, text FROM documents
        WHERE length(text) >= {SPAN_W}
    ),
    anchored AS (
        SELECT doc_id, source,
               {md5_long_sql(f'substr(text, CAST(p AS INT), {SPAN_W})')} AS h
        FROM (
            SELECT doc_id, source, text,
                   unnest(range(1, length(text) - {SPAN_W - 2})) AS p
            FROM docs
        )
        WHERE {md5_long_sql(f'substr(text, CAST(p AS INT), {ANCHOR_K})')}
              % {ANCHOR_D} = 0
    ),
    dup AS (
        SELECT h FROM anchored GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_docs AS (
        SELECT source, COUNT(*) AS n_docs FROM docs GROUP BY source
    ),
    per_spans AS (
        SELECT source, COUNT(*) AS n_spans FROM anchored GROUP BY source
    ),
    per_dup AS (
        SELECT source,
               COUNT(*) AS n_dup_instances,
               COUNT(DISTINCT doc_id) AS n_docs_with_dup
        FROM anchored JOIN dup USING (h)
        GROUP BY source
    )
    SELECT d.source,
           d.n_docs,
           s.n_spans,
           CAST(COALESCE(p.n_dup_instances, 0) AS BIGINT) AS n_dup_instances,
           CAST(COALESCE(p.n_docs_with_dup, 0) AS BIGINT) AS n_docs_with_dup
    FROM per_docs d
    JOIN per_spans s USING (source)
    LEFT JOIN per_dup p USING (source)
    """,
)
def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of verbatim W-char spans shared across docs.

    Pipeline: all positions (`sequence`, row-local) → content-defined
    anchor filter (md5 of the K-gram % D == 0, map-side) → 60-bit md5
    span hash at surviving anchors → inverted index (count distinct
    docs per hash) → duplicate hashes join back → per-source counts.
    The oracle regenerates positions with ``range``/``unnest`` and
    must agree on every anchor decision and span hash — extraction,
    anchoring, and the multi-doc test are pinned bit-exactly.
    """
    docs = (
        compute_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .filter(F.length("text") >= SPAN_W)
    )
    positions = F.sequence(F.lit(1), F.length("text") - (SPAN_W - 1))
    anchored = (
        docs.select(
            "doc_id", "source", "text", F.explode(positions).alias("p")
        )
        .filter(
            md5_long(F.expr(f"substring(text, p, {ANCHOR_K})")) % ANCHOR_D == 0
        )
        .select(
            "doc_id",
            "source",
            md5_long(F.expr(f"substring(text, p, {SPAN_W})")).alias("h"),
        )
    )
    dup = (
        anchored.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    per_docs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    per_spans = anchored.groupBy("source").agg(F.count("*").alias("n_spans"))
    per_dup = (
        anchored.join(dup, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_dup_instances"),
            F.countDistinct("doc_id").alias("n_docs_with_dup"),
        )
    )
    return (
        per_docs.join(per_spans, "source")
        .join(per_dup, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_spans",
            F.coalesce(F.col("n_dup_instances"), F.lit(0)).alias(
                "n_dup_instances"
            ),
            F.coalesce(F.col("n_docs_with_dup"), F.lit(0)).alias(
                "n_docs_with_dup"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Incremental ingestion dedup — the production shape of exact dedup:
# an incoming batch is checked against the BASE corpus's digest set
# (one hash join against the fingerprint index, not a full-corpus
# re-dedup), then deduped within itself (first doc_id per digest
# wins). At 100 TB the base digest relation is the only thing the
# incoming batch touches — a (digest, doc) int64 pair table, bucketed
# on digest in production so the probe is shuffle-light.
# ---------------------------------------------------------------------------
@query(
    "q_incremental_dedup",
    sql=f"""
    WITH base AS (
        SELECT DISTINCT {md5_long_sql('text')} AS h
        FROM documents WHERE doc_id % 10 < 8
    ),
    incoming AS (
        SELECT doc_id, source, {md5_long_sql('text')} AS h
        FROM documents WHERE doc_id % 10 >= 8
    ),
    flagged AS (
        SELECT i.doc_id, i.source, i.h,
               (b.h IS NOT NULL) AS dup_base
        FROM incoming i LEFT JOIN base b USING (h)
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk
        FROM flagged WHERE NOT dup_base
    )
    SELECT source,
           CAST((SELECT COUNT(*) FROM incoming x
                 WHERE x.source = t.source) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN dup_base THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_base,
           CAST(SUM(CASE WHEN NOT dup_base AND rk > 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup_incoming,
           CAST(SUM(CASE WHEN NOT dup_base AND rk = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
    FROM (
        SELECT doc_id, source, h, dup_base, NULL::BIGINT AS rk FROM flagged
        WHERE dup_base
        UNION ALL
        SELECT doc_id, source, h, dup_base, rk FROM ranked
    ) t
    GROUP BY source
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of an incoming batch vs the base corpus digest set."""
    docs = compute_table(spark, sf_dir, "documents").select(
        "doc_id", "source", md5_long(F.col("text")).alias("h")
    )
    base = docs.filter(F.col("doc_id") % 10 < 8).select("h").distinct()
    incoming = docs.filter(F.col("doc_id") % 10 >= 8)
    flagged = incoming.join(
        base.withColumn("dup_base", F.lit(True)), "h", "left"
    ).withColumn("dup_base", F.coalesce(F.col("dup_base"), F.lit(False)))
    from pyspark.sql import Window as _W

    w = _W.partitionBy("h").orderBy("doc_id")
    fresh = flagged.filter(~F.col("dup_base")).withColumn(
        "rk", F.row_number().over(w)
    )
    combined = flagged.filter(F.col("dup_base")).withColumn(
        "rk", F.lit(None).cast("long")
    ).unionByName(fresh)
    return combined.groupBy("source").agg(
        F.count("*").alias("n_incoming"),
        F.sum(F.when(F.col("dup_base"), 1).otherwise(0)).alias("n_dup_base"),
        F.sum(
            F.when(~F.col("dup_base") & (F.col("rk") > 1), 1).otherwise(0)
        ).alias("n_dup_incoming"),
        F.sum(
            F.when(~F.col("dup_base") & (F.col("rk") == 1), 1).otherwise(0)
        ).alias("n_novel"),
    )
