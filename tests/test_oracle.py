"""Differential tests: every registered SQL-expressible query must match its
DuckDB oracle (the driver's t2 gate, run locally at sf0.001 by default —
set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 for the driver's scale)."""

from __future__ import annotations

import pytest

from fintech_data_lake_as_code_spark.plans.oracle_check import compare
from fintech_data_lake_as_code_spark.registry import registry

SPECS = registry()
ORACLE_KEYS = sorted(k for k, s in SPECS.items() if s.oracle)
ROWS_ONLY_KEYS = sorted(k for k, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, key):
    spec = SPECS[key]
    result = compare(key, spec.fn(spark, sf_dir), spec.oracle, sf_dir)
    assert result.ok, str(result)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs_deterministically(spark, sf_dir, key):
    spec = SPECS[key]
    first = spec.fn(spark, sf_dir)
    n1 = first.count()
    n2 = spec.fn(spark, sf_dir).count()
    assert n1 == n2, f"{key}: row count not stable across runs ({n1} vs {n2})"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs), "oracle keys must be a subset of query keys"
    assert len(qs) > 0
