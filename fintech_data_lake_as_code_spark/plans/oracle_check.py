"""DuckDB-oracle differential harness (SURVEY.md §5.1).

Mirrors the driver's t2 gate: run the Spark query and the DuckDB oracle SQL
over the same parquet tables, then compare row-count + column names +
order-insensitive canonical values. Used by tests/test_oracle.py; running it
locally at sf0.001/sf0.01 before committing is the fast feedback loop.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from ..io import TABLES

FLOAT_DECIMALS = 6


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(x) -> str:
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NULL"
        return f"{x:.{FLOAT_DECIMALS}f}"
    if isinstance(x, (_dt.datetime, pd.Timestamp)):
        if x != x:  # NaT
            return "NULL"
        return pd.Timestamp(x).strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(x, _dt.date):
        return x.strftime("%Y-%m-%d")
    if isinstance(x, bool):
        return "true" if x else "false"
    return str(x)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, stringified, row-sorted representation."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.key}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues[:5]:
            msg += f"\n    - {i}"
        return msg


def compare(key: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    pdf_s = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        pdf_o = con.sql(oracle_sql).df()
    finally:
        con.close()

    issues: list[str] = []
    if sorted(pdf_s.columns) != sorted(pdf_o.columns):
        issues.append(
            f"columns differ: spark={sorted(pdf_s.columns)} oracle={sorted(pdf_o.columns)}"
        )
    if len(pdf_s) != len(pdf_o):
        issues.append(f"row count differs: spark={len(pdf_s)} oracle={len(pdf_o)}")
    if not issues:
        rows_s = canonical_rows(pdf_s)
        rows_o = canonical_rows(pdf_o)
        if rows_s != rows_o:
            diff_at = next(
                (i for i, (a, b) in enumerate(zip(rows_s, rows_o)) if a != b),
                min(len(rows_s), len(rows_o)),
            )
            issues.append(
                f"values differ at sorted row {diff_at}: "
                f"spark={rows_s[diff_at] if diff_at < len(rows_s) else '<none>'} "
                f"oracle={rows_o[diff_at] if diff_at < len(rows_o) else '<none>'}"
            )
    return CompareResult(key, not issues, len(pdf_s), len(pdf_o), issues)
