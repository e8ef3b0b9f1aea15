"""Physical-plan inspection helpers (SURVEY.md §4).

The engine's optimizer stance: express plans declaratively, let
Catalyst/Tungsten/AQE do the rewriting, then VERIFY the physical plan has
the properties that matter at 100 TB — filters pushed into the parquet
scan, dims broadcast, top-k compiled to TakeOrderedAndProject, no
cartesian products where a key join was intended. tests/test_plans.py
asserts these on the headline queries so a regression that silently
degrades a plan (e.g. a lost broadcast) fails CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan's plain tree string. Unlike the
    formatted explain, this rendering prefixes INVALID nodes with `!`
    (TreeNode marks nodes whose expressions reference attributes missing
    from their children) — the signature of an optimizer mis-rewrite
    that analysis accepted but whole-stage codegen will crash on at
    runtime (seen once: constraint inference pushing a filter that
    referenced the other join side, INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
    tests/test_plans.py sweeps every registered key for it."""
    return df._jdf.queryExecution().executedPlan().toString()


def has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the scan nodes."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema line(s) — column pruning evidence."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    )
