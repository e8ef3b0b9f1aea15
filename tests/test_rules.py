"""Invariant tests for the reference's declared rules (SURVEY.md §5.2,
FIXTURES.md §4): each B1-B5 detector must flag planted violations in
reference-shaped customeractivity data and stay silent on near-miss
negative controls."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.operators.detectors import (
    detect_city_hop,
    detect_consecutive_runs,
    detect_first_occurrence,
    detect_overdraft_freeze,
    detect_session_overlap,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def ts(minutes: float = 0, hours: float = 0, days: float = 0) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes, hours=hours, days=days)


def test_city_hop_flags_plant_not_controls(spark):
    rows = [
        # plant: user 1 hops BOM->DEL in 30 min
        (1, 1, ts(0), "BOM"),
        (2, 1, ts(30), "DEL"),
        # control: user 2 hops after 61 min (outside window)
        (3, 2, ts(0), "BOM"),
        (4, 2, ts(61), "DEL"),
        # control: user 3 same city 10 min apart
        (5, 3, ts(0), "MAA"),
        (6, 3, ts(10), "MAA"),
    ]
    df = spark.createDataFrame(
        rows, "row_id long, user_id long, ts timestamp, city string"
    )
    flagged = detect_city_hop(df).collect()
    assert [r.row_id for r in flagged] == [2]
    assert flagged[0].prev_city == "BOM" and flagged[0].gap_s == 1800


def test_session_overlap_flags_plant_not_adjacent(spark):
    rows = [
        # plant: user 1 session2 starts 200s into a 300s session
        (1, 1, ts(0), 300),
        (2, 1, ts(minutes=200 / 60), 300),
        # control: user 2 session2 starts exactly at session1 end (adjacent)
        (3, 2, ts(0), 300),
        (4, 2, ts(minutes=5), 300),
        # control: user 3 well separated
        (5, 3, ts(0), 120),
        (6, 3, ts(10), 120),
    ]
    df = spark.createDataFrame(
        rows, "row_id long, user_id long, ts timestamp, duration_s int"
    )
    flagged = detect_session_overlap(df).collect()
    assert [r.row_id for r in flagged] == [2]
    assert flagged[0].overlap_s == 100


def test_overdraft_freeze_window(spark):
    rows = [
        # user 1: +100.00 then -150.00 (overdraft at ts(10)); activity at
        # +1h (inside freeze) and +25h (outside)
        (1, 1, ts(0), 10000),
        (2, 1, ts(10), -15000),
        (3, 1, ts(minutes=10, hours=1), 500),
        (4, 1, ts(minutes=10, hours=25), 500),
        # control: user 2 never negative
        (5, 2, ts(0), 5000),
        (6, 2, ts(60), -3000),
    ]
    df = spark.createDataFrame(
        rows, "row_id long, user_id long, ts timestamp, amount_cents long"
    )
    flagged = detect_overdraft_freeze(df).collect()
    assert [r.row_id for r in flagged] == [3]


def test_first_occurrence_requires_history(spark):
    def user_rows(uid, n_prior, with_target, start_id):
        rows = [
            (start_id + i, uid, ts(minutes=i * 10), "ENQUIRY")
            for i in range(n_prior)
        ]
        if with_target:
            rows.append(
                (start_id + n_prior, uid, ts(minutes=n_prior * 10), "FOREX")
            )
        return rows

    rows = (
        user_rows(1, 5, True, 100)  # plant: 5 prior + first FOREX
        + user_rows(2, 4, True, 200)  # control: too little history
        + user_rows(3, 0, True, 300)  # control: FOREX is the first event
        + user_rows(4, 8, False, 400)  # control: never does FOREX
    )
    df = spark.createDataFrame(
        rows, "row_id long, user_id long, ts timestamp, event_type string"
    )
    flagged = detect_first_occurrence(
        df, F.col("event_type") == "FOREX", min_prior_events=5
    ).collect()
    assert [r.user_id for r in flagged] == [1]
    assert flagged[0].n_prior_events == 5


def test_consecutive_runs_islands(spark):
    d0 = dt.date(2024, 3, 1)

    def day(n):
        return d0 + dt.timedelta(days=n)

    rows = [
        # plant: user 1 three consecutive days
        (1, day(0), 2000), (1, day(1), 2500), (1, day(2), 3000),
        # control: user 2 only two consecutive days
        (2, day(0), 2000), (2, day(1), 2000),
        # control: user 3 gap splits runs into 2+1
        (3, day(0), 2000), (3, day(1), 2000), (3, day(3), 2000),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, day date, day_spend_cents long"
    )
    runs = detect_consecutive_runs(df, min_run_days=3).collect()
    assert [(r.user_id, r.run_len) for r in runs] == [(1, 3)]
    assert runs[0].run_start == "2024-03-01"
    assert runs[0].total_spend == pytest.approx(75.0)
