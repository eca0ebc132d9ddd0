from nyc_landmarks_datalake_spark.schema.sidecar import (
    SchemaValidationError,
    load_sidecar,
    parse_sidecar,
    partition_keys,
    validate_header,
)

__all__ = [
    "SchemaValidationError",
    "load_sidecar",
    "parse_sidecar",
    "partition_keys",
    "validate_header",
]
