"""Every registered query must match its DuckDB oracle (the driver's
correctness gate, replicated at sf0.001 for speed; the driver runs
sf0.01 — run tests/oracle_harness.run_parity at sf0.01 before shipping).
"""

from __future__ import annotations

import pytest

from nyc_landmarks_datalake_spark import registry
from tests.oracle_harness import run_parity

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_parity(spark, sf_small, name):
    problems = run_parity(spark, sf_small, [name])[name]
    assert not problems, "\n".join(problems)


def test_all_queries_have_oracle_or_reason():
    # Every query without an oracle must carry a documented reason.
    missing = set(registry.QUERIES) - set(registry.ORACLE) - set(registry.ROWS_ONLY)
    assert missing == set(), f"queries missing oracle SQL and reason: {missing}"


def test_harness_flags_dtype_class_skew():
    """The comparator must flag int-vs-float dtype skew even when the
    values are numerically equal — that is exactly the driver-hash
    failure mode that kept q_sequence_pack red for three rounds."""
    import pandas as pd

    from tests.oracle_harness import compare

    s = pd.DataFrame({"k": ["a", "b"], "v": pd.Series([0, 1], dtype="int64")})
    o = pd.DataFrame({"k": ["a", "b"], "v": pd.Series([0.0, 1.0], dtype="float64")})
    problems = compare(s, o, "seeded")
    assert any("DTYPE-CLASS SKEW" in p for p in problems), problems


def test_harness_flags_decimal_object_delivery():
    """Decimal-object columns must trip the skew flag BEFORE the float
    coercion hides them — a DECIMAL(38,0) output column red-rowed
    q_trend_slope in CORRECTNESS_r08 with every value equal (Spark
    delivers decimal.Decimal, DuckDB float64, driver hashes as
    delivered) while the harness silently coerced both to float."""
    from decimal import Decimal

    import pandas as pd

    from tests.oracle_harness import compare

    s = pd.DataFrame(
        {"k": ["a", "b"], "v": pd.Series([Decimal(1), Decimal(2)], dtype=object)}
    )
    o = pd.DataFrame({"k": ["a", "b"], "v": pd.Series([1.0, 2.0], dtype="float64")})
    problems = compare(s, o, "seeded")
    assert any(
        "DTYPE-CLASS SKEW" in p and "decimal.Decimal" in p for p in problems
    ), problems
    # ...and on the oracle side too (DuckDB can deliver DECIMAL(38,x)
    # as Decimal objects for some widths).
    problems = compare(o, s, "seeded")
    assert any(
        "DTYPE-CLASS SKEW" in p and "decimal.Decimal" in p for p in problems
    ), problems
