"""Canonical rule detectors (the shared cores of rules B1-B5).

Each detector operates on canonical column names so the same implementation
serves both surfaces:
- the driver's `events` table (adapters in rules.py), oracle-checked; and
- the reference-shaped `customeractivity` fixture (tests/test_rules.py),
  where planted violations must fire and near-miss negative controls must
  stay silent (FIXTURES.md §4).

Canonical columns: row_id (unique), user_id, ts (timestamp), plus the
detector-specific ones named per function.

Scale notes: every detector is a single shuffle on user_id (window) or a
groupBy + broadcast-join of small per-user anchors; no fact-fact range
joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _user_ts() -> Window:
    return Window.partitionBy("user_id").orderBy("ts", "row_id")


def detect_city_hop(df: DataFrame, max_gap_s: int = 3600) -> DataFrame:
    """B1 (setupTables.py:31): same user in a different `city` within
    `max_gap_s`. Needs: row_id, user_id, ts, city."""
    w = _user_ts()
    flagged = df.select(
        "row_id",
        "user_id",
        "city",
        F.lag("city").over(w).alias("prev_city"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
    )
    return flagged.where(
        F.col("prev_city").isNotNull()
        & (F.col("city") != F.col("prev_city"))
        & (F.col("gap_s") < max_gap_s)
    )


def detect_session_overlap(df: DataFrame) -> DataFrame:
    """B2 (setupTables.py:32): session starts before the previous session
    of the same user ended. Needs: row_id, user_id, ts, duration_s (int)."""
    w = _user_ts()
    end_epoch = F.unix_timestamp("ts") + F.col("duration_s").cast("bigint")
    flagged = df.select(
        "row_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.lag(end_epoch).over(w).alias("prev_end_epoch"),
    )
    return flagged.where(
        F.col("prev_end_epoch").isNotNull()
        & (F.col("ts_epoch") < F.col("prev_end_epoch"))
    ).withColumn("overlap_s", F.col("prev_end_epoch") - F.col("ts_epoch"))


def detect_overdraft_freeze(df: DataFrame, freeze_hours: int = 24) -> DataFrame:
    """B3 (setupTables.py:33-34): overdraft (running balance < 0) freezes
    the account; flag activity within the freeze window. Needs: row_id,
    user_id, ts, amount_cents (signed BIGINT, debits negative).

    Running balance via window; per-user first-overdraft anchors join
    back against the activity stream on user_id. No broadcast hint: the
    anchor set is one row PER OVERDRAFTED USER — unbounded on a real
    lake (round-8 review finding) — and both sides already shuffle on
    user_id, so the sort-merge/AQE choice is the scale-safe plan (AQE
    still auto-broadcasts when the anchors measure small at runtime)."""
    running = _user_ts().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ledger = df.withColumn("balance", F.sum("amount_cents").over(running))
    first_od = (
        ledger.where(F.col("balance") < 0)
        .groupBy("user_id")
        .agg(F.min("ts").alias("frozen_at"))
    )
    return (
        df.join(first_od, "user_id")
        .where(
            (F.col("ts") > F.col("frozen_at"))
            & (
                F.col("ts")
                <= F.col("frozen_at") + F.expr(f"INTERVAL {freeze_hours} HOURS")
            )
        )
        .select(
            "row_id",
            "user_id",
            F.unix_timestamp("ts").alias("ts_epoch"),
            F.unix_timestamp("frozen_at").alias("frozen_at_epoch"),
        )
    )


def detect_first_occurrence(
    df: DataFrame, target: Column, min_prior_events: int = 5
) -> DataFrame:
    """B4 (setupTables.py:35-36): user performs the target action for the
    first time, with enough prior non-target history ('never does forex,
    does it this time'). Needs: row_id, user_id, ts."""
    firsts = (
        df.where(target)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_target_ts"))
    )
    e = df.alias("e")
    f = firsts.alias("f")
    return (
        f.join(
            e,
            (F.col("e.user_id") == F.col("f.user_id"))
            & (F.col("e.ts") < F.col("f.first_target_ts")),
        )
        .groupBy(F.col("f.user_id").alias("user_id"), "f.first_target_ts")
        .agg(F.count("e.row_id").alias("n_prior_events"))
        .where(F.col("n_prior_events") >= min_prior_events)
        .select(
            "user_id",
            F.unix_timestamp("first_target_ts").alias("first_target_epoch"),
            "n_prior_events",
        )
    )


def detect_consecutive_runs(
    daily: DataFrame, min_run_days: int = 3
) -> DataFrame:
    """B5 (setupTables.py:37) / gaps-and-islands core: runs of >=
    `min_run_days` consecutive days. Needs: user_id, day (date),
    day_spend_cents (BIGINT)."""
    w = Window.partitionBy("user_id").orderBy("day")
    islands = daily.withColumn(
        "island_key", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        islands.groupBy("user_id", "island_key")
        .agg(
            F.min("day").alias("_run_start"),
            F.count("*").alias("run_len"),
            F.sum("day_spend_cents").alias("_total_cents"),
        )
        .where(F.col("run_len") >= min_run_days)
        .select(
            "user_id",
            F.col("_run_start").cast("string").alias("run_start"),
            "run_len",
            (F.col("_total_cents").cast("double") / 100).alias("total_spend"),
        )
    )
