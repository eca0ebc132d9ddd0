from nyc_landmarks_datalake_spark.sources.catalog import TABLES, register_views, table

__all__ = ["TABLES", "table", "register_views"]
