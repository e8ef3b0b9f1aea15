"""UDF / UDAF / UDTF surface (SURVEY.md §2.C) — the deliberate Python
extension points. Everything else in the engine stays JVM-side; these three
queries exercise each Python escape hatch with Arrow batching.

Reference parity: the city/feature vocabulary normalizer (case/name drift,
setupTables.py:16,20 — SURVEY §1.4.4) as a vectorized scalar UDF; a custom
regularity score (ref B7, setupTables.py:41) as a grouped-map UDAF; token
expansion as a UDTF.

Scale notes: pandas_udf/applyInPandas move data via Arrow record batches
(~10-100x over row-at-a-time UDFs); the grouped map shuffles once on
user_id. The UDTF fans out rows JVM->Python->JVM — at 100 TB prefer the
built-in explode (see text.py) unless per-row logic is genuinely Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load
from ..registry import query

# Synonym map mirroring the reference's two feature vocabularies
# (setupTables.py:16 uppercase enum vs :20 lowercase aliases).
_SYNONYMS = {
    "view": "ENQUIRY",
    "click": "FUNDTRANSFER",
    "purchase": "CAPITALMARKET-INVEST",
    "signup": "UPITRANSACTION",
    "error": "NON_MONETARY",
}


@query(
    "udf_scalar_python",
    oracle="""
    SELECT CASE lower(event_type)
             WHEN 'view' THEN 'ENQUIRY'
             WHEN 'click' THEN 'FUNDTRANSFER'
             WHEN 'purchase' THEN 'CAPITALMARKET-INVEST'
             WHEN 'signup' THEN 'UPITRANSACTION'
             WHEN 'error' THEN 'NON_MONETARY'
             ELSE upper(event_type) END AS feature_norm,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: vocabulary normalizer
    (ref §1.4.4 'upi' vs 'UPITRANSACTION' drift)."""

    @F.pandas_udf(T.StringType())
    def normalize(s: pd.Series) -> pd.Series:
        low = s.str.lower()
        return low.map(_SYNONYMS).fillna(s.str.upper())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy(normalize("event_type").alias("feature_norm")).agg(
        F.count("*").alias("n_events")
    )


@query(
    "udf_vectorized_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           round(stddev_samp(gap_s), 4) AS gap_std
    FROM (
      SELECT user_id,
             epoch(ts) - lag(epoch(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    """,
)
def udf_vectorized_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDAF (applyInPandas): per-user inter-event-gap
    regularity score (ref B7 'regular forex ... continuous scrutiny',
    setupTables.py:41). One shuffle on user_id; Arrow batches per group."""
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("gap_std", T.DoubleType()),
        ]
    )

    def regularity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dt.total_seconds()
        # ddof=1 == SQL stddev_samp; n_events counts rows, gaps has n-1 values
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "gap_std": [round(gaps.std(ddof=1), 4)],
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return (
        ev.groupBy("user_id")
        .applyInPandas(regularity, out_schema)
        .where(F.col("n_events") >= 3)
    )


@query(
    "udtf_expand",
    oracle="""
    SELECT doc_id, CAST(i AS INTEGER) AS pos, parts[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents WHERE doc_id < 20),
         UNNEST(generate_series(1, len(parts))) AS t(i)
    """,
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark >=3.5): expand each document into (pos, word)
    rows — the table-function surface. The built-in posexplode path is the
    100 TB default (text.py); this exercises the UDTF mechanism."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield i, w

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )
