"""Query registry — the engine's declared surface.

Every operator from SURVEY.md §2 registers here as a named query: a Spark
callable `(spark, sf_dir) -> DataFrame` plus, when SQL-expressible, the
equivalent DuckDB oracle SQL. `__spark_entry__.queries()` / `oracle_sql()`
are thin views over this registry, and the pytest differential harness
iterates it directly.

Oracle-parity conventions (keep these or the value-hash comparison breaks):
- alias EVERY computed column, identically in Spark and SQL;
- round float aggregates (sums/avgs/scores) in BOTH engines;
- emit epoch seconds (`unix_timestamp` / floor(epoch())) instead of raw
  timestamps — robust to driver session timezone;
- deterministic tie-breaks on every rank/top-k/limit (append a key column);
- cast floor/ceil and similar to the same type on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: Optional[str]  # DuckDB SQL over the pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a query under `name` with an optional oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        aggregates,
        cdc,
        dedup,
        joins,
        projections,
        rules,
        scale,
        scans,
        similarity,
        sorts,
        text,
        windows,
    )
    from .functions import scalar, udfs  # noqa: F401
    from .sources import datagen, pyds  # noqa: F401
    from .streaming import queries as streaming_queries  # noqa: F401


def registry() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def all_queries() -> dict[str, SparkQuery]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}
