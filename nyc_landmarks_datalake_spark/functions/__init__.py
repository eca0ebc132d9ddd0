from nyc_landmarks_datalake_spark.functions.hashing import (
    MERSENNE_P,
    md5_long,
    md5_long_sql,
    minhash_coeffs,
)

__all__ = ["md5_long", "md5_long_sql", "minhash_coeffs", "MERSENNE_P"]
