"""Custom Python DataSource (Spark 4 DataSource V2 Python API) — the
extensibility seam for sources Spark has no built-in reader for
(proprietary feeds, REST paginators, bespoke binary formats).

The registered demo source ``lcgsource`` is a deterministic generator:
each of ``numPartitions`` partitions independently yields
``rowsPerPartition`` rows of a fixed LCG stream seeded by the
partition id — exercising the real contract (partition planning on
the driver, per-partition iterators on executors, schema declaration,
option passing) with arithmetic simple enough to mirror into the
oracle. DuckDB reproduces the identical rows from the same LCG
recurrence via a recursive CTE, so the whole Python-source path is
value-checked bit-exactly, not just smoke-tested.

Scale posture: partitions() returns one split per logical shard, so
parallelism is source-defined exactly like a JDBC/REST source would
shard; each read() is a pure generator (no driver materialization).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
)

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_647  # Mersenne 2^31-1, matches functions/hashing.py LCG


class _LcgPartition(InputPartition):
    def __init__(self, pid: int, n_rows: int):
        self.pid = pid
        self.n_rows = n_rows


class LcgReader(DataSourceReader):
    def __init__(self, options):
        self.num_partitions = int(options.get("numpartitions", 4))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))

    def partitions(self):
        return [
            _LcgPartition(p, self.rows_per_partition)
            for p in range(self.num_partitions)
        ]

    def read(self, partition: _LcgPartition):
        state = partition.pid + 1
        for i in range(partition.n_rows):
            state = (LCG_A * state + LCG_C) % LCG_M
            yield (partition.pid, i, state)


class JsonPartWriter(DataSourceWriter):
    """Python DataSource WRITE path: each task serializes its partition
    to one JSON-lines part file in ``path``; commit() publishes a
    _SUCCESS manifest listing the committed parts (the two-phase
    task-write → driver-commit contract of the V2 writer API). Parts
    are named by a uuid so speculative/retried tasks never collide;
    only files named in the manifest count as committed."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lcgsource writer requires a path")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.json"
        full = os.path.join(self.path, fname)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1

        class _Msg(WriterCommitMessage):
            pass

        m = _Msg()
        m.fname = fname
        m.n = n
        return m

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "parts": sorted(m.fname for m in messages if m is not None),
            "rows": sum(m.n for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            _json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.fname))
                except OSError:
                    pass


class LcgDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lcgsource"

    def schema(self) -> str:
        return "part_id INT, row_idx INT, value BIGINT"

    def reader(self, schema) -> LcgReader:
        return LcgReader(self.options)

    def writer(self, schema, overwrite: bool) -> JsonPartWriter:
        return JsonPartWriter(self.options)


def register_lcg_source(spark) -> None:
    """Idempotently register the source with the session."""
    try:
        spark.dataSource.register(LcgDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise


def _register_queries() -> None:
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.registry import query

    n_parts, n_rows = 4, 1000

    @query(
        "q_python_datasource_scan",
        sql=f"""
        WITH RECURSIVE lcg(part_id, row_idx, value) AS (
            SELECT p.part_id, 0 AS row_idx,
                   ({LCG_A} * (p.part_id + 1) + {LCG_C}) % {LCG_M} AS value
            FROM (SELECT unnest(range(0, {n_parts})) AS part_id) p
            UNION ALL
            SELECT part_id, row_idx + 1,
                   ({LCG_A} * value + {LCG_C}) % {LCG_M}
            FROM lcg WHERE row_idx + 1 < {n_rows}
        )
        SELECT part_id, COUNT(*) AS n_rows,
               CAST(SUM(value) AS BIGINT) AS sum_value,
               CAST(MIN(value) AS BIGINT) AS min_value,
               CAST(MAX(value) AS BIGINT) AS max_value
        FROM lcg GROUP BY 1
        """,
    )
    def q_python_datasource_scan(spark, sf_dir: str):
        register_lcg_source(spark)
        df = (
            spark.read.format("lcgsource")
            .option("numPartitions", n_parts)
            .option("rowsPerPartition", n_rows)
            .load()
        )
        return df.groupBy("part_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )


_register_queries()
