"""Semantics pins for the Spark 4 SQL-surface tier
(operators/spark4_features.py): VARIANT shredding, SQL-UDF inlining,
UTF8_LCASE collation folding, pipe syntax, LATERAL top-1.

Value parity vs DuckDB is covered by the parametrized oracle sweep
(tests/test_oracle_parity.py); these tests pin the *semantics* that a
hash match alone would not explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark import registry

registry.load_all()


def test_collation_folds_case_variants(spark, sf_small):
    """UTF8_LCASE distinct must merge the injected case variants: every
    nation's folded count is <= its raw count, and at least one nation
    actually folds (the case-noise CASE guarantees variants exist
    wherever a segment has customers in >=2 residue classes)."""
    rows = registry.QUERIES["q_collation_distinct"](spark, sf_small).collect()
    assert rows
    assert all(r.folded_variants <= r.raw_variants for r in rows)
    assert any(r.folded_variants < r.raw_variants for r in rows)
    # collation comparison is case-insensitive: the machinery count under
    # the collated literal equals the explicit-lower() recount
    from nyc_landmarks_datalake_spark.sources.catalog import table

    cust = table(spark, sf_small, "customer")
    expected = (
        cust.filter(F.lower("c_mktsegment") == "machinery")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    got = {r.c_nationkey: r.n_machinery for r in rows}
    for e in expected:
        assert got[e.c_nationkey] == e["count"]


def test_sql_udf_stays_jvm_side(spark, sf_small):
    """SQL UDFs must inline into the plan — no BatchEvalPython /
    ArrowEvalPython node (that is the whole point vs a Python UDF)."""
    df = registry.QUERIES["q_sql_udf_pricing"](spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "pythonUDF" not in plan


def test_pipe_syntax_matches_classic_form(spark, sf_small):
    """The |> form must produce exactly the classic nested-SELECT rows."""
    from nyc_landmarks_datalake_spark.sources.catalog import register_views

    register_views(spark, sf_small)
    classic = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    piped = registry.QUERIES["q_pipe_syntax_pricing"](spark, sf_small)
    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    assert sorted(map(tuple, piped.collect())) == sorted(
        map(tuple, classic.select(*piped.columns).collect())
    )


def test_lateral_topk_is_per_group_max(spark, sf_small):
    """LATERAL top-1 must equal the window-function formulation."""
    from nyc_landmarks_datalake_spark.sources.catalog import table

    got = {
        r.n_name: (r.top_customer, r.top_acctbal)
        for r in registry.QUERIES["q_lateral_topk_customers"](
            spark, sf_small
        ).collect()
    }
    cust = table(spark, sf_small, "customer")
    nation = table(spark, sf_small, "nation")
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    want = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_name", "c_acctbal")
        .collect()
    )
    assert got == {r.n_name: (r.c_name, r.c_acctbal) for r in want}


def test_variant_shred_counts_every_event(spark, sf_small):
    from nyc_landmarks_datalake_spark.sources.catalog import table

    rows = registry.QUERIES["q_variant_shred"](spark, sf_small).collect()
    total = sum(r.n_events for r in rows)
    assert total == table(spark, sf_small, "events").count()
    assert all(r.min_k <= r.max_k for r in rows)
