"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and values (columns
sorted by name, rows sorted by all columns). Floats must match to
tight tolerance; everything else exactly — stricter than any
reasonable value-hash, so passing here implies passing the driver.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from nyc_landmarks_datalake_spark.sources.catalog import TABLES

REL_TOL = 1e-12


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _decimal_cols(df: pd.DataFrame) -> set[str]:
    """Columns delivered as decimal.Decimal objects (dtype=object)."""
    out: set[str] = set()
    for c in df.columns:
        s = df[c]
        # check EVERY non-null value, not just the first — a mixed
        # column whose first value is not a Decimal must still flag
        if s.dtype == object and s.dropna().map(
            lambda v: isinstance(v, Decimal)
        ).any():
            out.add(c)
    return out


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    dec = _decimal_cols(df)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif c in dec:
            df[c] = s.astype(float)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [
            f"{name}: column mismatch spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        ]
    if len(spark_df) != len(oracle_df):
        return [f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"]
    # Decimal-OBJECT delivery is itself a dtype-class skew, flagged
    # BEFORE the float coercion below hides it: Spark toPandas delivers
    # DecimalType as decimal.Decimal objects while DuckDB fetchdf
    # delivers (most) decimals as float64, and the driver hashes values
    # as delivered — q_trend_slope red-rowed r8 on exactly this even
    # though every value was equal. A Decimal column on EITHER side
    # means the query should emit one correctly-rounded cast to DOUBLE
    # (VARCHAR-routed on the DuckDB side) instead.
    for c, side in (
        *((c, "spark") for c in sorted(_decimal_cols(spark_df))),
        *((c, "oracle") for c in sorted(_decimal_cols(oracle_df))),
    ):
        problems.append(
            f"{name}.{c}: DTYPE-CLASS SKEW {side} delivers decimal.Decimal "
            f"objects — driver hash mismatches even on equal values; emit "
            f"one correctly-rounded CAST(... AS DOUBLE) instead"
        )
    s = _normalize(spark_df)
    o = _normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Dtype-CLASS skew (one side integral, the other float) is a
        # driver red row even when values agree: the driver hashes the
        # pandas values as delivered, and 0 != 0.0 under its hash. The
        # classic source is an uncast DuckDB integer promotion (windowed
        # SUM → HUGEINT → fetchdf float64) — q_sequence_pack r3-r5.
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_flt = pd.api.types.is_float_dtype(sv)
        o_flt = pd.api.types.is_float_dtype(ov)
        if (s_int and o_flt) or (s_flt and o_int):
            problems.append(
                f"{name}.{c}: DTYPE-CLASS SKEW spark={sv.dtype} "
                f"oracle={ov.dtype} — driver hash mismatches even on equal "
                f"values; CAST the oracle (or Spark) side"
            )
        if s_flt or o_flt:
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            close = np.isclose(sa, oa, rtol=REL_TOL, atol=1e-12) | both_nan
            exact = (sa == oa) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"{name}.{c}: value mismatch row {i}: spark={sa[i]!r} oracle={oa[i]!r}"
                )
            elif not exact.all():
                i = int(np.argmin(exact))
                problems.append(
                    f"{name}.{c}: NOT BIT-EXACT (close) row {i}: "
                    f"spark={sa[i]!r} oracle={oa[i]!r} diff={sa[i]-oa[i]!r}"
                )
        else:
            eq = (sv.to_numpy() == ov.to_numpy()) | (sv.isna() & ov.isna()).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"{name}.{c}: value mismatch row {i}: "
                    f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
                )
    return problems


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from nyc_landmarks_datalake_spark import registry

    registry.load_all()
    con = duckdb_conn(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in registry.QUERIES.items():
        if names and name not in names:
            continue
        sql = registry.ORACLE.get(name)
        if sql is None:
            continue
        try:
            out = fn(spark, sf_dir)
            # A DecimalType OUTPUT column is banned outright: toPandas
            # delivers it as decimal.Decimal objects and the driver's
            # value hash mismatches float64 delivery from DuckDB even
            # on equal values (q_trend_slope, CORRECTNESS_r08). Exact
            # decimals belong INSIDE the query; emit one correctly-
            # rounded cast to DOUBLE (oracle side VARCHAR-routed).
            from pyspark.sql.types import DecimalType

            dec = [f.name for f in out.schema.fields if isinstance(f.dataType, DecimalType)]
            if dec:
                results[name] = [
                    f"{name}: DecimalType output column(s) {dec} — driver "
                    f"delivery skew; cast to DOUBLE in the projection"
                ]
                continue
            sdf = out.toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: SPARK ERROR {e}"]
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: ORACLE ERROR {e}"]
            continue
        results[name] = compare(sdf, odf, name)
    return results
