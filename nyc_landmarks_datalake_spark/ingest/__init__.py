from nyc_landmarks_datalake_spark.ingest.csv_ingest import ingest_csv, massage_lines

__all__ = ["ingest_csv", "massage_lines"]
