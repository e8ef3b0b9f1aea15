"""Projection / filter / predicate operators (SURVEY.md §2.C).

Reference parity: A8 typed DDL (setupTables.py:49-59 — casts/renames),
A9 enum-domain + NOT NULL constraints (setupTables.py:53,56) including the
non-strict-MySQL invalid-enum bucket (SURVEY.md §1.4.1).

Scale notes: pure narrow transformations — no shuffle; predicates and
column pruning reach the parquet scan via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents, exact_sum
from ..io import load
from ..registry import query


@query(
    "project_rename_cast",
    oracle="""
    SELECT l_orderkey AS order_key,
           CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
           CAST((CAST(ROUND(l_extendedprice * 1000, 0) AS BIGINT)
                 * CAST(ROUND((1 - l_discount) * 1000, 0) AS BIGINT)
                 + 50) // 100 AS DOUBLE) / 10000 AS net_price,
           UPPER(l_returnflag) AS rflag
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select / alias / cast incl. arithmetic projection (ref A8 typed
    columns, setupTables.py:49-59).

    Engine semantics the oracle must MIRROR, not reinterpret (both from
    the r17 seeded-net sweep, the first fixture with fractional
    quantities / 3-decimal price grids):
    - Spark's double->int cast TRUNCATES toward zero; DuckDB's rounds
      half-to-even (13.75 -> 13 vs 14), so the oracle casts TRUNC().
    - net_price rounds to 4 decimals in exact integer 1e-4 units
      (price and discount are <=3-decimal-exact, so their product is
      6-decimal-exact; +50 // 100 is half-away-from-zero on positive
      cents-of-cents) — ROUND(x, 4) on the double product lands on
      exact X.XXXX5 ties that Spark and DuckDB break differently."""
    li = load(spark, sf_dir, "lineitem")
    p6 = cents(F.col("l_extendedprice"), 3) * cents(1 - F.col("l_discount"), 3)
    return (
        li.where(F.col("l_orderkey") % 10 == 0)
        .withColumn("_p6", p6)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").cast("bigint").alias("line_no"),
            F.col("l_quantity").cast("int").alias("qty_int"),
            # (+50) div 100 is half-AWAY-FROM-ZERO only because _p6 >= 0
            # (fixture invariant: prices > 0, discounts in [0,1] — see
            # TESTDATA.md's lineitem generator); a negative net price
            # would flip this to half-toward-+inf on BOTH engines alike
            # (DuckDB // truncates like Spark div), so cross-engine
            # equality survives, but the rounding NAME in the docstring
            # would not. Revisit with sign(_p6)*50 if negatives ever
            # enter a fixture (ADVICE r17).
            (F.expr("(_p6 + 50) div 100").cast("double") / 10000).alias(
                "net_price"
            ),
            F.upper("l_returnflag").alias("rflag"),
        )
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND (l_quantity < 10 OR l_quantity > 40)
      AND l_returnflag IN ('A', 'N')
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, BETWEEN, IN (ref A3 selection
    rule + A9 domains) — all pushed to the scan. The date window sits
    INSIDE the data's 1995-2001 shipdate span: a window outside it made
    both engines return zero rows and the differential vacuous (round-8
    review finding) — a selective-but-nonempty result is what certifies
    the predicate translation and pushdown."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between("1996-01-01", "1997-01-01")
        & F.col("l_discount").between(0.02, 0.08)
        & ((F.col("l_quantity") < 10) | (F.col("l_quantity") > 40))
        & F.col("l_returnflag").isin("A", "N")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


EVENT_DOMAIN = ("view", "click", "purchase", "signup", "error")


@query(
    "filter_null_domain",
    oracle="""
    SELECT CASE
             WHEN event_type IS NULL OR value IS NULL THEN 'null'
             WHEN event_type IN ('view','click','purchase','signup','error')
               THEN 'valid'
             ELSE 'invalid'
           END AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def filter_null_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT NULL + enum-domain validation split (ref A9, setupTables.py:53,56;
    invalid bucket mirrors MySQL non-strict enum coercion, SURVEY §1.4.1)."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("event_type").isNull() | F.col("value").isNull(), "null")
        .when(F.col("event_type").isin(*EVENT_DOMAIN), "valid")
        .otherwise("invalid")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_rows"),
        exact_sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
    )
