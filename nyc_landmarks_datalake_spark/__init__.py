"""nyc_landmarks_datalake_spark — a PySpark-native data-lake engine.

A from-scratch reimplementation of the capabilities of
dferguson992/NYC-Landmarks-Datalake (reference: a single AWS Lambda CSV
ingest function, ``CSVIngest.java``), re-expressed Spark-first:

- the reference's bronze→silver ingest (sidecar JSON schema registry,
  header validation, WKT MULTIPOLYGON normalization, partition-key-aware
  zone movement) → Structured Streaming / batch CSV ingest into
  partitioned Parquet (``ingest/``, ``schema/``, ``streaming/``);
- the analytics tier the reference's lake implies (but delegates to
  unseen downstream tooling) → a full Spark SQL / DataFrame relational
  surface (``operators/relational.py`` et al.);
- LLM-data-pipeline extensions: dedup, similarity search, text analysis
  (``operators/dedup.py``, ``operators/similarity.py``,
  ``functions/text.py``), all shuffle-aware and designed for 100 TB.

Every query in the registry (``registry.QUERIES``) carries a DuckDB
oracle SQL string (``registry.ORACLE``) proving result parity.
"""

from nyc_landmarks_datalake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
