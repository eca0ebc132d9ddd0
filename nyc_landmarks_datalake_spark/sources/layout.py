"""Physical layout control: partitioned + bucketed writes, compaction.

These are the levers that matter most at 100 TB:

- **partitionBy** on low-cardinality keys → partition pruning removes
  whole directories at planning time (the reference's sidecar carries a
  `partition_key` flag for exactly this, CSVIngest.java:191, unused
  there);
- **bucketBy** on join/agg keys → co-located joins with NO exchange on
  either side (verified in tests by asserting the absence of shuffle
  exchanges in the physical plan);
- **compaction** — streaming ingest produces one file per micro-batch
  per partition; compact() rewrites a zone to target-sized files so
  scans stay at maxPartitionBytes-sized splits instead of millions of
  tiny reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucket pruning + exchange-free joins).
    Bucket count is a layout contract: both sides of a co-located join
    must agree on it, so treat it like a schema decision."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a parquet zone into ~target_files well-sized files
    (per partition-value slice when partitioned)."""
    import os as _os
    import shutil as _shutil

    # crash recovery: a previous compact may have died between its two
    # swap renames (zone renamed aside, new zone never moved in) —
    # restore the old zone before doing anything else
    base = path.rstrip("/")
    old = base + "__replaced"
    if not _os.path.isdir(base) and _os.path.isdir(old):
        _os.rename(old, base)

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    writer = (
        df.repartition(target_files, *[F.col(c) for c in partition_cols])
        if partition_cols
        else df.repartition(target_files)
    )
    w = writer.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    # swap keeping the old zone on disk until the new one is fully
    # committed (same protocol as the streaming upsert sink, including
    # the recovery above): a crash mid-swap leaves the data in either
    # the zone or its __replaced sibling, and the next compact restores
    _shutil.rmtree(old, ignore_errors=True)
    _os.rename(base, old)
    _os.rename(tmp, base)
    _shutil.rmtree(old, ignore_errors=True)
