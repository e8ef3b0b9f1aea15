"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``fintech_data_lake_as_code_spark``
package; this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Best-effort: make an on-disk protobuf runtime importable (and exported
# via PYTHONPATH) as early as possible — if the caller imports this module
# before building its SparkSession, the Python workers inherit it and
# stream_transform_with_state can take its real transformWithStateInPandas
# path instead of the applyInPandasWithState fallback. Safe no-op when
# protobuf is already installed or absent (compat.tws_supported re-probes
# the workers at query time either way).
from fintech_data_lake_as_code_spark.compat import ensure_protobuf as _ensure_pb

_ensure_pb()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The city-hop rule — the reference's first declared analytic
    (reference resources/data/setupTables.py:31: "the account cannot be
    accessed by the same user from different cities within an hour") —
    transposed to the `events` table and enriched with customer info.
    """
    from fintech_data_lake_as_code_spark.operators.rules import city_hop_flagship

    return city_hop_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from fintech_data_lake_as_code_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query key."""
    from fintech_data_lake_as_code_spark.registry import all_oracles

    return all_oracles()
