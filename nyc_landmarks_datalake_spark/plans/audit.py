"""Physical-plan audit: machine-readable summary of the properties that
matter at 100 TB — predicate pushdown, column pruning, join strategies,
exchange count, whole-stage codegen coverage.

The reference has no optimizer at all (SURVEY §4.1 — straight-line
Java); on Spark these properties are Catalyst's job, and this module is
how we *verify* we're getting them rather than assuming. Used by
tests/test_plans.py to pin plan shapes for the headline queries, and by
the bench loop to catch plan regressions (e.g. a broadcast silently
degrading to a sort-merge join after a schema change).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    broadcast_exchanges: int = 0
    wholestage_codegen_spans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    has_python_eval: bool = False

    @property
    def scans_with_pushdown(self) -> int:
        return sum(1 for f in self.pushed_filters if f not in ("", "[]"))


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def audit(df: DataFrame, execute: bool = False) -> PlanAudit:
    """Summarize the physical plan. With ``execute=True`` the DataFrame
    is collected first so AQE finalizes (isFinalPlan=true) — codegen
    span counts are only meaningful on the final plan."""
    if execute:
        df.collect()
    plan = _plan_string(df)
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    if not codegen_ids:
        formatted = explain_formatted(df)
        codegen_ids = set(re.findall(r"\[codegen id : (\d+)\]", formatted))
    return PlanAudit(
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        exchanges=len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        broadcast_exchanges=plan.count("BroadcastExchange"),
        wholestage_codegen_spans=len(codegen_ids),
        pushed_filters=re.findall(r"PushedFilters: (\[[^\]]*\])", plan),
        read_schemas=re.findall(r"ReadSchema: ([^\n,]+)", plan),
        partition_filters=re.findall(r"PartitionFilters: (\[[^\]]*\])", plan),
        has_python_eval=("BatchEvalPython" in plan)
        or ("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan)
        or ("AggregateInPandas" in plan)
        or ("ArrowAggregatePython" in plan)
        or ("MapInArrow" in plan)
        or ("PythonMapInArrow" in plan),
    )
