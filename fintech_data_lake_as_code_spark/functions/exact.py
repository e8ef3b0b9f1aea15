"""Exact money arithmetic helpers.

The reference stores money as DECIMAL(8,2) (setupTables.py:54) — exact
cents. The driver tables store money-like columns as doubles, and floating
sums are both order-dependent (Spark's partial aggregation vs DuckDB's
single-threaded fold) and round-boundary-hazardous (`ROUND` implementations
disagree exactly on `x.xx5` doubles, which products of 2-decimal data hit
systematically). The engine therefore aggregates money as integer-scaled
BIGINT ("cents"), which is exact and associative — identical in any
execution order, on any engine — and unscales only at output.

SQL-side mirror of `cents`/`unscale`:
    CAST(ROUND(x * 100, 0) AS BIGINT)          -- cents(x, 2)
    CAST(SUM(c) AS DOUBLE) / 100               -- unscale(sum, 2)

Scale note: BIGINT cents overflow at ~9.2e16 currency units; beyond that
(full 100 TB global sums) switch the accumulator to DECIMAL(38,0) — same
pattern, same exactness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column, decimals: int = 2) -> Column:
    """Exact integer-scaled representation of a value with `decimals`
    exact decimal digits."""
    return F.round(col * (10 ** decimals), 0).cast("long")


def cents_dec(col: Column, decimals: int = 2) -> Column:
    """`cents` with a DECIMAL(38,0) accumulator type — for moment-style
    aggregations (sums of squared/multiplied cents) whose products
    overflow BIGINT long before the raw sums do. Same rounding, wider
    ring; this IS the "switch the accumulator to DECIMAL(38,0)" scale
    path the module docstring describes."""
    return F.round(col * (10 ** decimals), 0).cast("decimal(38,0)")


def unscale(col: Column, decimals: int = 2) -> Column:
    return col.cast("double") / (10 ** decimals)


def exact_sum(col: Column, decimals: int = 2) -> Column:
    """Order-independent exact sum of a `decimals`-exact column, as double."""
    return unscale(F.sum(cents(col, decimals)), decimals)


def exact_avg(col: Column, decimals: int = 2) -> Column:
    """Exact-scaled average: identical double in any engine that computes
    (exact integer sum) / (count * scale)."""
    return F.sum(cents(col, decimals)).cast("double") / (
        F.count(col) * (10 ** decimals)
    )
