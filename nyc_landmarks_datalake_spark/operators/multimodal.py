"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

SURVEY §2.B "LLM-pipeline ops" / task-spec multimodal requirement. The
container has no image/audio libraries, so the *decode* step is stubbed
two ways (as the spec directs):

- ``decode_image`` raises NotImplementedError unless PIL is importable
  (import-try gate) — the real-library seam;
- ``extract_features`` computes a deterministic md5-derived feature
  vector from the raw bytes — a fake featurizer with 100% real Spark
  plumbing: binary column in, Arrow batch iteration, ``array<float>``
  (+ scalar) columns out. Because it is md5-derived it is also
  oracle-checkable in DuckDB, so the pandas-UDF path itself is under
  the correctness gate (q_multimodal_features).

Scale design: payloads stay opaque bytes in parquet; metadata lives in
sibling scalar columns so planning-time pruning (kind/width filters)
never touches payload bytes; mapInPandas streams Arrow batches with
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding memory —
the pattern holds at 100 TB because no stage materializes more than a
batch per task, and feature extraction is embarrassingly parallel
(zero shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table, table

FEATURE_DIM = 8

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table (no media libs in the container):
    payload bytes derive from md5 chains over the id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat_ws(
                "", *[F.md5(F.concat(F.lit(str(i)), F.col("id"))) for i in range(4)]
            ),
            "UTF-8",
        ).alias("payload"),
        F.struct(
            ((F.col("id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("id") % 9 + 1) * 64).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            ((F.col("id") % 30 + 1) * 10).cast("int").alias("n_frames"),
            F.element_at(
                F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("format"),
        ).alias("meta"),
    )


def _md5_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake featurizer: consecutive md5 hex byte-pairs,
    scaled to [0, 1]. Stands in for a real encoder; bit-reproducible in
    any engine (the DuckDB oracle recomputes it in SQL)."""
    digest = hashlib.md5(payload).hexdigest()
    return [int(digest[2 * j : 2 * j + 2], 16) / 255.0 for j in range(dim)]


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, dim: int = FEATURE_DIM
) -> DataFrame:
    """binary payload → float feature vector via Arrow-batched mapInPandas."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [ _md5_features(bytes(p), dim) for p in payloads ],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — requires an imaging library (absent in this
    container); the seam is explicit per the task spec."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - the expected path here
        raise NotImplementedError(
            "image decode requires Pillow; this environment stubs the "
            "decode step — use extract_features for the plumbing-checked path"
        ) from e
    raise NotImplementedError("real decode wiring lands when a decoder exists")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes frame indexes 0, n, 2n, ...
    from metadata without touching payload bytes (planning stays
    metadata-only; the per-frame decode would join back by media_id)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize as metadata transform (aspect-preserving target dims);
    payload re-encode is the stubbed decoder's job."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return df.select(
        "media_id",
        "kind",
        (F.col("meta.width") * scale).cast("int").alias("target_width"),
        (F.col("meta.height") * scale).cast("int").alias("target_height"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked multimodal pipeline: text → binary payload → Arrow-
# batched featurizer → scalar feature columns. This puts the actual
# mapInPandas machinery under the DuckDB correctness gate.
# ---------------------------------------------------------------------------
_FEATURE_COLS_SQL = ", ".join(
    f"(('0x' || substr(md5(text), {2 * j + 1}, 2))::BIGINT / 255.0) AS f{j}"
    for j in range(FEATURE_DIM)
)


@query(
    "q_multimodal_features",
    sql=f"""
    SELECT doc_id,
           {_FEATURE_COLS_SQL},
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = compute_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = extract_features(docs, "doc_id", "payload")
    return feats.select(
        "doc_id",
        *[F.element_at(F.col("features"), j + 1).alias(f"f{j}") for j in range(FEATURE_DIM)],
        "n_bytes",
    )


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest a directory of media files as a multimodal table via
    Spark's built-in ``binaryFile`` source: payload bytes + path-derived
    kind/format metadata, no Python in the scan. At 100 TB this is the
    bronze tier for images/audio/video — the source supports predicate
    pushdown on (path, modificationTime, length), so planning filters
    (e.g. length < 100MB, extension match) never read payload bytes."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif"), "image")
        .when(ext.isin("wav", "mp3", "flac"), "audio")
        .when(ext.isin("mp4", "avi", "mkv"), "video")
        .otherwise("other")
    )
    return raw.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            ext.alias("format"),
        ).alias("meta"),
        F.col("path"),
        F.col("length").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Driver-checked twins of the metadata-only media plans. The media
# table synthesizes deterministically from range(N) (kind/meta are pure
# id arithmetic), so the DuckDB oracle reproduces it from range() and
# the frame-sampling / resize logic lands under the correctness gate —
# payload bytes stay untouched in both engines (the plans are the
# point: at 100 TB you never deserialize payloads to plan work).
# ---------------------------------------------------------------------------
_MEDIA_N = 100


@query(
    "q_media_frame_plan",
    sql=f"""
    WITH media AS (
        SELECT range AS media_id,
               ['image', 'audio', 'video'][CAST(range % 3 + 1 AS INT)] AS kind,
               (range % 30 + 1) * 10 AS n_frames
        FROM range({_MEDIA_N})
    )
    SELECT media_id,
           COUNT(*) AS n_sampled,
           CAST(MIN(frame_idx) AS BIGINT) AS first_idx,
           CAST(MAX(frame_idx) AS BIGINT) AS last_idx
    FROM (
        SELECT media_id, unnest(range(0, n_frames, 10)) AS frame_idx
        FROM media WHERE kind = 'video'
    )
    GROUP BY 1
    """,
)
def q_media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, _MEDIA_N)
    return (
        frame_sample(media, every_n=10)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("frame_idx").cast("long").alias("first_idx"),
            F.max("frame_idx").cast("long").alias("last_idx"),
        )
    )


@query(
    "q_media_resize_plan",
    sql=f"""
    WITH media AS (
        SELECT range AS media_id,
               ['image', 'audio', 'video'][CAST(range % 3 + 1 AS INT)] AS kind,
               (range % 16 + 1) * 64 AS width,
               (range % 9 + 1) * 64 AS height
        FROM range({_MEDIA_N})
    )
    SELECT media_id, kind,
           CAST(trunc(width * least(1.0, 256.0 / greatest(width, height)))
                AS INT) AS target_width,
           CAST(trunc(height * least(1.0, 256.0 / greatest(width, height)))
                AS INT) AS target_height
    FROM media
    """,
)
def q_media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(synthesize_media(spark, _MEDIA_N), max_side=256)
