"""Order-independent (bit-exact) numeric aggregation helpers.

Floating-point SUM/AVG are accumulation-order dependent; Spark's
partial-per-partition merge order differs from DuckDB's, so a naive
``sum(double)`` can differ in the last ulps and break value-hash parity.

Fix: aggregate through exact DECIMAL arithmetic (both engines sum
decimals exactly; the double→decimal cast of the *same* input double is
identical in both) and cast the exact result back to DOUBLE. Derived
stats (avg, stddev, corr) are then computed in float64 FROM those exact
sums, so every arithmetic step is bit-identical across engines.

This is also the right answer at 100 TB: decimal partial aggregation is
still map-side combined and shuffle-light; determinism costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer headroom for sf1000-scale sums (10^32) at 6dp
_PREC, _SCALE = 30, 6


def dsum(col: Column) -> Column:
    """Exact sum of a double column, returned as double."""
    return F.sum(col.cast(f"decimal({_PREC},{_SCALE})")).cast("double")


def davg(col: Column) -> Column:
    """Deterministic mean: exact sum / count, divided in float64."""
    return dsum(col) / F.count(col)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT({expr}))"


def dstddev(col: Column) -> Column:
    """Deterministic sample stddev from exact sums (float64 derivation)."""
    n = F.count(col).cast("double")
    sx = dsum(col)
    sx2 = dsum(col * col)
    return F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1.0)))


def dstddev_sql(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = dsum_sql(expr)
    sx2 = dsum_sql(f"({expr}) * ({expr})")
    return f"sqrt(({sx2} - {sx} * {sx} / {n}) / ({n} - 1.0))"


def dcorr(x: Column, y: Column) -> Column:
    """Deterministic Pearson correlation from exact sums."""
    n = F.count(x).cast("double")
    sx, sy = dsum(x), dsum(y)
    sxx, syy, sxy = dsum(x * x), dsum(y * y), dsum(x * y)
    return (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )


def dcorr_sql(x: str, y: str) -> str:
    n = f"CAST(COUNT(*) AS DOUBLE)"
    sx, sy = dsum_sql(x), dsum_sql(y)
    sxx, syy = dsum_sql(f"({x})*({x})"), dsum_sql(f"({y})*({y})")
    sxy = dsum_sql(f"({x})*({y})")
    return (
        f"(({n} * {sxy} - {sx} * {sy}) / "
        f"(sqrt({n} * {sxx} - {sx} * {sx}) * sqrt({n} * {syy} - {sy} * {sy})))"
    )
