"""Bronze→silver CSV ingest — the reference's entire production surface
(CSVIngest.handleRequest, CSVIngest.java:210-278) re-expressed as one
declarative Spark pipeline.

Reference stage → here:

- S3 event trigger + GET (R1/R3)        → batch: spark.read.csv; stream:
  streaming.stream_ingest (file-source discovery replaces the trigger)
- tag lookup + schema fetch (R4/R5)     → sidecar path convention
  (schemas/<table>.json), schema/sidecar.py
- header validation (R8)                → validate_header, strict or
  permissive mode (the reference *discards* the result, §1.4.4)
- quote-strip + geometry massage (R9-12)→ parse-then-transform: proper
  CSV quoting (fixes the ragged-row corruption of §1.4.2), then a
  geometry Column expression (functions/geometry.py)
- single-object PUT (R14)               → partitioned parquet write
  driven by the sidecar's partition_key flags (which the reference
  parses but never uses, CSVIngest.java:191)

``massage_lines`` is the byte-level compat path replicating the
reference's de-facto line transform (R9-R11) for consumers that expect
its exact output, ragged rows and all.

Scale: the whole pipeline is a scan → project → partitioned write; no
shuffle at all unless the writer repartitions by partition key (exposed
as ``repartition_output`` — at 100 TB you want one task per output
partition slice, not 32 writers × N partitions of small files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_landmarks_datalake_spark.functions.geometry import (
    wkt_blank,
    wkt_colon_encode,
    wkt_parse,
)
from nyc_landmarks_datalake_spark.schema.sidecar import (
    load_sidecar,
    partition_keys,
    validate_header,
)

GEOMETRY_MODES = ("blank", "encode", "parse", "keep")


def read_csv_with_sidecar(
    spark: SparkSession, csv_path: str, sidecar_path: str
) -> tuple[DataFrame, T.StructType]:
    """Read CSV with proper quote handling, all columns typed per sidecar."""
    schema = load_sidecar(sidecar_path)
    df = spark.read.csv(csv_path, header=True, schema=schema, quote='"', escape='"')
    return df, schema


def ingest_csv(
    spark: SparkSession,
    csv_path: str,
    sidecar_path: str,
    dest_path: str,
    geometry_mode: str = "encode",
    geometry_col: str = "the_geom",
    strict: bool = False,
    repartition_output: int | None = None,
) -> DataFrame:
    """Full bronze→silver ingest; returns the written DataFrame."""
    if geometry_mode not in GEOMETRY_MODES:
        raise ValueError(f"geometry_mode must be one of {GEOMETRY_MODES}")
    df, schema = read_csv_with_sidecar(spark, csv_path, sidecar_path)
    validate_header(list(df.columns), schema, strict=strict)

    if geometry_col in df.columns and geometry_mode != "keep":
        fn = {"blank": wkt_blank, "encode": wkt_colon_encode, "parse": wkt_parse}[
            geometry_mode
        ]
        df = df.withColumn(geometry_col, fn(F.col(geometry_col)))

    pkeys = [k for k in partition_keys(schema) if k in df.columns]
    writer = df
    if repartition_output and pkeys:
        writer = df.repartition(repartition_output, *[F.col(k) for k in pkeys])
    w = writer.write.mode("overwrite")
    if pkeys:
        w = w.partitionBy(*pkeys)
    w.parquet(dest_path)
    return df


def massage_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Byte-compat replica of the reference's de-facto line transform
    (handleCSVIngest, CSVIngest.java:60-86): strip every double-quote
    (:65), strip the literal 'MULTIPOLYGON ' token and trim (:67),
    delete the (((...))) coordinate block (:68). The colon-encode branch
    (:71-81) is dead code there — line.contains("MULTIPOLYGON") is
    always false by :71 — so it is intentionally NOT applied here.
    """
    c = F.col(value_col)
    c = F.regexp_replace(c, '"', "")
    c = F.trim(F.regexp_replace(c, "MULTIPOLYGON ", ""))
    c = F.regexp_replace(c, r"\(\(\([0-9\-\., ()]+\)\)\)", "")
    return lines.withColumn(value_col, c)


def ingest_compat(
    spark: SparkSession, csv_path: str, dest_path: str
) -> DataFrame:
    """Reference-parity path: text-in, massaged-text-out, one output file
    (the Lambda PUTs a single object, CSVIngest.java:265-269)."""
    lines = spark.read.text(csv_path)
    massaged = massage_lines(lines)
    massaged.coalesce(1).write.mode("overwrite").text(dest_path)
    return massaged


def normalize_object_key(key: str) -> str:
    """R2 — the reference's S3-key normalization (CSVIngest.java:221-224):
    '+' → space, then URL-decode. Driver-side because object keys are
    control-plane metadata, not data."""
    from urllib.parse import unquote

    return unquote(key.replace("+", " "))


def normalize_key_col(col):
    """Column flavor of R2 for key-like *data* columns:
    url_decode(regexp_replace(col, '\\+', ' '))."""
    return F.url_decode(F.regexp_replace(col, r"\+", " "))


def sidecar_for(csv_path: str, schemas_dir: str | None = None) -> str:
    """schemas/<basename>.json convention (the reference's SCHEMA_LOCATION
    object-tag indirection, CSVIngest.java:88-100, collapsed to a path
    convention)."""
    base = os.path.splitext(os.path.basename(csv_path))[0]
    d = schemas_dir or os.path.join(os.path.dirname(csv_path), "schemas")
    return os.path.join(d, f"{base}.json")
