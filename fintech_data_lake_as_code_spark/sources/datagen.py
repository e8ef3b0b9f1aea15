"""Seeded data generators (SURVEY.md §2.A A14/A15/A17).

Re-expresses the reference's workload generator — `updateTables.py:12-21`
draws city/type/feature uniformly, money in [100, 10000] at 2 dp, session
length in [100, 180], at 1 row / 5 s (`:59`); `generatedata.py:10-12`
samples account ids without replacement — as deterministic, engine-portable
arithmetic: a 2^31-modulus LCG (a=1103515245, c=12345, the classic C rand
constants) evaluated per (row, field). The LCG is a bijection mod 2^31, so
ordering by it yields an exact-size sample without replacement (A15), and
every generated value is reproducible in pure SQL — the DuckDB oracle runs
the same arithmetic over range().

The enum mismatch is generated faithfully: draws come from
{CREDIT, DEBIT, NONMON} (updateTables.py:13) but the DDL enum is
{CREDIT, DEBIT, NON_MONETARY} (setupTables.py:53), so NONMON lands in the
MySQL non-strict invalid bucket '' (SURVEY §1.4.1) — ~1/3 of rows.

Scale notes: generation is spark.range-based — embarrassingly parallel,
no shuffle, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31

CITIES = [
    "BOM", "DEL", "BLR", "CAL", "MAA", "GOI", "COK",
    "HYD", "PNQ", "SXR", "TRV", "AMD", "ZER",
]  # updateTables.py:12
TXN_DRAWS = ["CREDIT", "DEBIT", "NONMON"]  # updateTables.py:13
TXN_ENUM = ["CREDIT", "DEBIT", "NON_MONETARY"]  # setupTables.py:53
FEATURES = [
    "FUNDTRANSFER", "UPITRANSACTION", "ENQUIRY", "FOREX",
    "MF-INVEST", "CAPITALMARKET-INVEST", "FD-INVEST", "PENSIONFUND-INVEST",
]  # setupTables.py:56
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
N_ROWS = 1000  # updateTables.py:56 — first 1,000 account ids


def lcg(col: Column) -> Column:
    """One LCG step; stays within int64 (inputs < 2^31)."""
    return (col * F.lit(LCG_A) + F.lit(LCG_C)) % F.lit(LCG_M)


def lcg_sql(expr: str) -> str:
    return f"(({expr}) * {LCG_A} + {LCG_C}) % {LCG_M}"


def _draw(i: Column, field_idx: int) -> Column:
    """Two LCG steps seeded by (row, field) — decorrelates fields."""
    return lcg(lcg(i * 1000 + F.lit(field_idx)))


def _draw_sql(field_idx: int) -> str:
    return lcg_sql(lcg_sql(f"i * 1000 + {field_idx}"))


def customeractivity(spark: SparkSession, n_rows: int = N_ROWS) -> DataFrame:
    """The reference's `customeractivity` insert workload as a DataFrame
    (schema: setupTables.py:49-59; distributions: updateTables.py:12-21)."""
    df = spark.range(0, n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    city_idx = (_draw(i, 1) % 13 + 1).cast("int")
    txn_idx = (_draw(i, 2) % 3 + 1).cast("int")
    feat_idx = (_draw(i, 5) % 8 + 1).cast("int")
    txn_draw = F.element_at(F.array(*[F.lit(x) for x in TXN_DRAWS]), txn_idx)
    return df.select(
        i.alias("row_id"),
        (F.lit(100000) + _draw(i, 0) % 900000).alias("user_id"),
        F.element_at(F.array(*[F.lit(x) for x in CITIES]), city_idx).alias("city"),
        # MySQL non-strict coercion: invalid enum member -> '' (SURVEY §1.4.1)
        F.when(txn_draw.isin(*TXN_ENUM), txn_draw)
        .otherwise(F.lit(""))
        .alias("transaction_type"),
        ((_draw(i, 3) % 990001).cast("double") / 100 + 100).alias("monetary_value"),
        (F.lit(100) + _draw(i, 4) % 81).cast("int").alias("timeinapp"),
        F.element_at(F.array(*[F.lit(x) for x in FEATURES]), feat_idx).alias(
            "feature_used"
        ),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + i * 5).alias("ts"),
    )


CUSTOMERACTIVITY_ORACLE = f"""
    WITH rows_ AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, {N_ROWS})),
    drawn AS (
      SELECT i,
             {_draw_sql(0)} AS h0, {_draw_sql(1)} AS h1, {_draw_sql(2)} AS h2,
             {_draw_sql(3)} AS h3, {_draw_sql(4)} AS h4, {_draw_sql(5)} AS h5
      FROM rows_
    )
    SELECT i AS row_id,
           100000 + h0 % 900000 AS user_id,
           (['BOM','DEL','BLR','CAL','MAA','GOI','COK','HYD','PNQ','SXR','TRV','AMD','ZER'])
             [CAST(h1 % 13 + 1 AS INTEGER)] AS city,
           CASE (['CREDIT','DEBIT','NONMON'])[CAST(h2 % 3 + 1 AS INTEGER)]
             WHEN 'NONMON' THEN ''
             ELSE (['CREDIT','DEBIT','NONMON'])[CAST(h2 % 3 + 1 AS INTEGER)] END
             AS transaction_type,
           CAST(h3 % 990001 AS DOUBLE) / 100 + 100 AS monetary_value,
           CAST(100 + h4 % 81 AS INTEGER) AS timeinapp,
           (['FUNDTRANSFER','UPITRANSACTION','ENQUIRY','FOREX','MF-INVEST',
             'CAPITALMARKET-INVEST','FD-INVEST','PENSIONFUND-INVEST'])
             [CAST(h5 % 8 + 1 AS INTEGER)] AS feature_used,
           {BASE_EPOCH} + i * 5 AS ts_epoch
    FROM drawn
"""


@query("datagen_customeractivity", oracle=CUSTOMERACTIVITY_ORACLE)
def datagen_customeractivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: the reference's random insert workload, seeded + portable
    (updateTables.py:18-23). ts emitted as epoch for engine parity."""
    df = customeractivity(spark)
    return df.select(
        "row_id",
        "user_id",
        "city",
        "transaction_type",
        "monetary_value",
        "timeinapp",
        "feature_used",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


@query(
    "datagen_account_sample",
    oracle=f"""
    SELECT 100000 + i AS account_id
    FROM (SELECT CAST(range AS BIGINT) AS i FROM range(0, 900000))
    ORDER BY {lcg_sql("i")}
    LIMIT 500
    """,
)
def datagen_account_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: exact-size sampling without replacement — 500 of the 900,000
    possible account numbers (generatedata.py:10-12). The LCG is a bijection
    mod 2^31, so ordering by it is a deterministic shuffle; LIMIT takes an
    exact-size sample. Distributed top-k (TakeOrderedAndProject), no full
    sort."""
    df = spark.range(0, 900000).withColumnRenamed("id", "i")
    return (
        df.orderBy(lcg(F.col("i")))
        .select((F.lit(100000) + F.col("i")).alias("account_id"))
        .limit(500)
    )
