"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims is registered here with BOTH a Spark
DataFrame implementation and (where SQL-expressible) an equivalent
ANSI-SQL string the DuckDB oracle runs on the same parquet tables.
Column names/aliases are kept identical on both sides — the driver's
comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
#: queries deliberately registered WITHOUT oracle SQL (driver falls back
#: to its rows-only check) → reason string for the judge/tests.
ROWS_ONLY: dict[str, str] = {}


def rows_only(name: str, reason: str) -> None:
    if name not in QUERIES:
        raise KeyError(name)
    ROWS_ONLY[name] = reason


def register(name: str, fn: QueryFn, sql: str | None = None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def query(name: str, sql: str | None = None):
    """Decorator form of :func:`register`."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, sql)
        return fn

    return deco


def load_all() -> None:
    """Import every query-providing module (idempotent)."""
    import nyc_landmarks_datalake_spark.operators.relational  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.windows  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.events  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.dedup  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.similarity  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.textops  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.asof  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.nested  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.multimodal  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.joins_extra  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.sketches  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.mixed  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.udfs  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.tpch_extra  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.tpch_remaining  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.profiling  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.sampling  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.functions_battery  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.merge  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.graph  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.events_analytics  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.geometry_ops  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.training_pipeline  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.source_roundtrip  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.clustering  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.zorder  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.bucketing  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.assoc  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.spark4_features  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.webcuration  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.wordpiece  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.fuzzyjoin  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.unigram_soft  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.agreement  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.spandedup  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.ts_stats  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.pandas_api  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.bpe  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.quality_clf  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.unigram_lm  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.dsir  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.linkage  # noqa: F401
    import nyc_landmarks_datalake_spark.operators.video  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.stateful  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.dedup  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.stream_join  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.ingest_dedup  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.window_replay  # noqa: F401
    import nyc_landmarks_datalake_spark.streaming.mv_upsert  # noqa: F401
    import nyc_landmarks_datalake_spark.sources.pyds  # noqa: F401
