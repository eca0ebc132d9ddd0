from nyc_landmarks_datalake_spark.plans.audit import audit, explain_formatted

__all__ = ["audit", "explain_formatted"]
