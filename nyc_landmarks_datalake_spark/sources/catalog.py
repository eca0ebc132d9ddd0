"""Table catalog over a scale-factor directory of parquet files.

The reference keeps its "catalog" as S3 object tags pointing at sidecar
schema files (CSVIngest.java:88-100, :232-234). Here the analytics-zone
catalog is simply parquet-with-embedded-schema per table; the sidecar
machinery lives in :mod:`nyc_landmarks_datalake_spark.schema.sidecar`
and is used by the ingest tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# is 5 rows, nation 25 — fixed size regardless of sf). customer/supplier
# grow with sf but stay broadcastable to ~sf100; Catalyst's size-based
# threshold decides beyond that.
BROADCAST_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


#: for compute-bound pipelines, aim for ~this much scan input per task —
#: heavy row work (shingling, md5/minhash, vector math) expands each
#: input byte many times over, so partitions sized for plain scans are
#: far too coarse.
_COMPUTE_CHUNK_BYTES = 256 << 10

#: (sf_dir, name) → scan partition count; probing via df.rdd builds a
#: JavaRDD each call, so repeated compute_table calls memoize it (the
#: test parquet inputs are immutable).
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def compute_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like :func:`table`, but guarantees enough partitions for
    compute-bound per-row pipelines. A small corpus often arrives as one
    parquet file (one non-splittable row group) → one task, which
    serializes heavy row work on a single core. Target = one partition
    per ~256KB of input, clamped to cluster parallelism; at 100 TB the
    scan's own partitioning already exceeds the clamp and this is a
    no-op. The repartition shuffles only raw rows (cheap) and is paid
    once before the expensive projection."""
    df = table(spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        return df
    target = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            nbytes // _COMPUTE_CHUNK_BYTES,
        ),
    )
    key = (sf_dir, name)
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    if target > 1 and _SCAN_PARTS[key] < target:
        df = df.repartition(target)
    return df


#: (sf_dir) → inferred events schema; inference runs a footer-read job
#: under the legacy-nanos flag, so memoize it per directory.
_EVENTS_SCHEMA: dict[str, object] = {}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long and truncate to microseconds (the
    same truncation DuckDB applies when casting ns→µs timestamps).

    The legacy ``nanosAsLong`` flag is needed only while INFERRING the
    schema (a footer-read job), so it is set and restored around that
    step alone; the actual scan uses an explicit schema and leaves
    session config untouched — a reader must not permanently mutate
    shared session state."""
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, "events.parquet")
    if sf_dir not in _EVENTS_SCHEMA:
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            _EVENTS_SCHEMA[sf_dir] = spark.read.parquet(path).schema
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    df = spark.read.schema(_EVENTS_SCHEMA[sf_dir]).parquet(path)
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # Parquet timestamp[us] WITHOUT a timezone loads as TIMESTAMP_NTZ
        # on Spark >= 3.4 inference paths; NTZ rejects unix_micros and
        # withWatermark. The session timezone is pinned UTC
        # (session.py), so reinterpreting NTZ wall-clock values as UTC
        # instants is lossless and matches DuckDB's epoch_us semantics.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
