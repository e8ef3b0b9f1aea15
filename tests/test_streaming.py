"""Streaming semantics tests (SURVEY.md §5.5): bounded file-stream runs
with deterministic micro-batches. The oracle-backed streaming keys are
covered by test_oracle.py; this file asserts the behaviors the driver only
rows-only-checks — late-data drop under watermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import load
from fintech_data_lake_as_code_spark.streaming.queries import (
    stream_watermark_late,
)


def test_watermark_drops_late_redelivery(spark, sf_dir):
    result = stream_watermark_late(spark, sf_dir).collect()
    got = {(r.window_start_epoch, r.n_events) for r in result}

    ev = load(spark, sf_dir, "events")
    max_epoch = ev.agg(F.max(F.unix_timestamp("ts"))).first()[0]
    # expected: per-window counts from the ORIGINAL stream only (batch-2
    # redeliveries, despite doubling old rows, must not change any count),
    # restricted to windows closed by the watermark (end <= max - 10 min).
    expected_all = {
        (r.w, r.n)
        for r in ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 600) * 600).alias("w")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    closed = {(w, n) for (w, n) in expected_all if w + 600 <= max_epoch - 600}

    # every emitted window must carry the duplicate-free count
    emitted_ws = {w for (w, _) in got}
    assert got <= expected_all, "late rows leaked into window counts"
    # all watermark-closed windows were emitted (engine may also have
    # emitted boundary windows; never fewer)
    assert {w for (w, _) in closed} <= emitted_ws
    # and no window was emitted twice with different counts
    assert len(emitted_ws) == len(got)
