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


def test_every_key_is_oracle_graded():
    # the registry's strongest correctness property: NO key falls back to
    # the driver's weaker rows-only check — every operator carries a full
    # DuckDB value-hash oracle. If a future key genuinely cannot be
    # SQL-expressed, remove it from this pin and restore a rows-only
    # determinism test for it (run it twice, compare counts).
    assert ROWS_ONLY_KEYS == [], (
        "keys without oracles appeared; grade them rows-only deliberately: "
        f"{ROWS_ONLY_KEYS}"
    )


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
