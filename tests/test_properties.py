"""Property-based tests (hypothesis) for the two mechanisms every oracle
match depends on: the portable LCG (identical in Python, Spark SQL, and
DuckDB) and exact integer-cents money arithmetic (identical under any
partitioning/order). Examples are batched into ONE Spark job per test so
hypothesis's example count doesn't multiply JVM job overhead."""

from __future__ import annotations

import decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fintech_data_lake_as_code_spark.sources.datagen import (
    LCG_A,
    LCG_C,
    LCG_M,
    lcg_sql,
)


def _py_lcg(x: int) -> int:
    return (x * LCG_A + LCG_C) % LCG_M


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=50))
@settings(max_examples=25, deadline=None)
def test_lcg_python_equals_duckdb(seeds):
    con = duckdb.connect()
    vals = ", ".join(f"({s})" for s in seeds)
    got = con.execute(
        f"SELECT {lcg_sql('CAST(x AS BIGINT)')} FROM (VALUES {vals}) t(x)"
    ).fetchall()
    assert [g[0] for g in got] == [_py_lcg(s) for s in seeds]


def test_lcg_python_equals_spark(spark):
    # deterministic pseudo-random probe set incl. boundary seeds
    seeds = [0, 1, 2**31 - 1, LCG_M - 1] + [(_py_lcg(i * 7919) % LCG_M) for i in range(200)]
    from pyspark.sql import functions as F

    from fintech_data_lake_as_code_spark.sources.datagen import lcg

    df = spark.createDataFrame([(s,) for s in seeds], "x long").select(
        "x", lcg(F.col("x")).alias("y")
    )
    got = {r.x: r.y for r in df.collect()}
    assert got == {s: _py_lcg(s) for s in seeds}


@given(
    st.lists(
        st.decimals(
            min_value=decimal.Decimal("-999999.99"),
            max_value=decimal.Decimal("999999.99"),
            places=2,
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=25, deadline=None)
def test_cents_sum_is_exact_and_order_free(vals):
    # the pure-arithmetic core of exact_sum: summing scaled BIGINTs must
    # equal exact decimal addition regardless of order/grouping
    cents = [int(v * 100) for v in vals]
    total = decimal.Decimal(sum(cents)) / 100
    assert total == sum(vals)
    assert sum(sorted(cents)) == sum(reversed(sorted(cents))) == sum(cents)


@pytest.mark.parametrize("n_part", [1, 3, 32])
def test_exact_sum_identical_under_any_partitioning(spark, n_part):
    # 2-decimal doubles chosen to sit on round-boundary hazards (x.xx5):
    # float64 sum order changes the naive result; exact_sum must not move
    from pyspark.sql import functions as F

    from fintech_data_lake_as_code_spark.functions.exact import exact_sum

    rows = [(i, ((i * 37) % 1000) + 0.005 + (i % 7) * 0.11,) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(n_part)
    got = df.agg(exact_sum(F.col("v")).alias("s")).first().s
    # the SQL-side mirror formula on the SAME binary doubles must agree
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["id", "v"]))
    expected = con.execute(
        "SELECT CAST(SUM(CAST(ROUND(v * 100, 0) AS BIGINT)) AS DOUBLE) / 100 FROM t"
    ).fetchone()[0]
    assert got == expected
    # and identical across partitionings (the order-independence invariant)
    base = df.coalesce(1).agg(exact_sum(F.col("v")).alias("s")).first().s
    assert got == base
