"""Fixture-distribution guards for the two calibrated split gates.

`rule_b10_cross_sell` and `join_anti` carry value gates
(`B10_LARGE_PURCHASE_GATE`, `ANTI_LARGE_ORDER_GATE`) whose only job is
to make the anti legs discriminate on the shipped fixtures (the r15
vacuousness-audit findings). A gate is only honest while it SPLITS the
population it filters; a fixture regeneration that shifts the value
distribution could silently drain either side back to zero and turn the
green grade into a schema-only certificate again (ADVICE r16 #3).

These tests re-measure the shipped fixtures with DuckDB (no Spark
session — they run in milliseconds) and pin the split: each side must
hold at least MIN_SPLIT_FRACTION of its population at every shipped
scale factor. On today's fixtures the splits sit at 7/15 & 67/150
(b10 regulars with a large purchase) and 20/150 & 202/1500 (customers
with no large order) — comfortably inside the 5% floor on both sides.

The constants are imported from the operator modules, so a drive-by
edit of either gate re-runs the same guard against the same data.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from fintech_data_lake_as_code_spark.operators.joins import (
    ANTI_LARGE_ORDER_GATE,
)
from fintech_data_lake_as_code_spark.operators.rules import (
    B10_LARGE_PURCHASE_GATE,
)

MIN_SPLIT_FRACTION = 0.05

SHIPPED_SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.fixture(scope="module", params=SHIPPED_SF_DIRS)
def sf_dir(request) -> str:
    return request.param


def _assert_splits(n_total: int, n_above: int, gate_name: str, where: str):
    assert n_total > 0, f"{where}: population empty — fixture missing?"
    lo = MIN_SPLIT_FRACTION * n_total
    assert lo <= n_above <= n_total - lo, (
        f"{gate_name} no longer splits the population at {where}: "
        f"{n_above}/{n_total} above the gate (need >={lo:.1f} on each "
        "side). Re-derive the gate from the regenerated distribution."
    )


def test_b10_gate_splits_regulars(sf_dir):
    """>=5% of regulars must hold a large purchase AND >=5% must not.

    The 'above' side is B10's excluded set (the anti leg is live); the
    'below' side is B10's result set (the grade is non-empty)."""
    con = duckdb.connect()
    n_total, n_above = con.execute(
        f"""
        WITH regulars AS (
          SELECT user_id FROM read_parquet(?) WHERE event_type = 'view'
          GROUP BY user_id
          HAVING COUNT(DISTINCT CAST(ts AS DATE)) >= 5
        ),
        mx AS (
          SELECT r.user_id,
                 COALESCE(MAX(e.value) FILTER (
                     WHERE e.event_type = 'purchase'), 0) AS mx
          FROM regulars r
          LEFT JOIN read_parquet(?) e ON e.user_id = r.user_id
          GROUP BY r.user_id
        )
        SELECT COUNT(*),
               SUM(CASE WHEN mx > {B10_LARGE_PURCHASE_GATE}
                        THEN 1 ELSE 0 END)
        FROM mx
        """,
        [os.path.join(sf_dir, "events.parquet")] * 2,
    ).fetchone()
    _assert_splits(
        n_total, n_above, "B10_LARGE_PURCHASE_GATE", f"{sf_dir}/events"
    )


def test_anti_gate_splits_customers(sf_dir):
    """>=5% of customers must lack a large order AND >=5% must hold one.

    The 'below' side is join_anti's result population (non-empty grade);
    the 'above' side keeps the anti set proper (not everyone qualifies)."""
    con = duckdb.connect()
    n_total, n_above = con.execute(
        f"""
        WITH mx AS (
          SELECT c.c_custkey, COALESCE(MAX(o.o_totalprice), 0) AS mx
          FROM read_parquet(?) c
          LEFT JOIN read_parquet(?) o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey
        )
        SELECT COUNT(*),
               SUM(CASE WHEN mx > {ANTI_LARGE_ORDER_GATE}
                        THEN 1 ELSE 0 END)
        FROM mx
        """,
        [
            os.path.join(sf_dir, "customer.parquet"),
            os.path.join(sf_dir, "orders.parquet"),
        ],
    ).fetchone()
    _assert_splits(
        n_total, n_above, "ANTI_LARGE_ORDER_GATE", f"{sf_dir}/orders"
    )


def test_oracle_sql_embeds_the_same_gates():
    """The registered oracle strings must carry the module constants —
    a gate edited in only one of (query, oracle) diverges the engines."""
    from fintech_data_lake_as_code_spark.registry import registry

    specs = registry()
    assert f"> {B10_LARGE_PURCHASE_GATE}" in specs["rule_b10_cross_sell"].oracle
    assert f"> {ANTI_LARGE_ORDER_GATE}" in specs["join_anti"].oracle
