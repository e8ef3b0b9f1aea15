"""Seeded-random differential fixtures (r15): beyond the single planted
cases, generate small adversarial events tables — guaranteed exact
(user_id, ts) collisions at second resolution and values on the
.5-cent-tie grid — and run the most tie-break-sensitive events-only
keys through the driver contract (registered query vs the key's own
DuckDB oracle, test_udf_edges._compare). Deterministic seeds: any
divergence is a reproducible ordering/rounding bug, not a flake."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_udf_edges import _compare

KEYS = (
    "join_asof_nearest",      # nearest-tie: backward-wins + equidistant
    "cdc_scd2_intervals",     # interval chaining under ts collisions
    "win_match_recognize",    # per-user sequence order under ties
    "win_islands_consecutive",  # gap/island edges under duplicate ts
    "win_sessionize",         # session splits exactly at the gap bound
)


def _events_dir(tmp_path_factory, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = 400
    d = str(tmp_path_factory.mktemp(f"seeded_sf_{seed}"))
    base = 1_700_000_000
    # ten days (so consecutive-day islands can form) x a SMALL intra-day
    # offset pool (so exact (user_id, ts) collisions still occur)
    secs = (
        base
        + rng.integers(0, 10, n) * 86_400
        + rng.integers(0, 600, n)
    )
    event_id = rng.permutation(n) + 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(event_id, type=pa.int64()),
                "ts": pa.array(
                    (secs * 1_000_000).astype("int64"),
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    rng.integers(1, 15, n), type=pa.int64()
                ),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "purchase", "signup", "error"], n
                    ),
                    type=pa.string(),
                ),
                # multiples of 0.005: value*100 lands on exact .5 ties
                "value": pa.array(
                    rng.integers(0, 4000, n) * 0.005, type=pa.float64()
                ),
                "props": pa.array(
                    [json.dumps({"k": int(i)}) for i in event_id],
                    type=pa.string(),
                ),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


@pytest.fixture(scope="module", params=[20250815, 994871])
def seeded_dir(request, tmp_path_factory) -> str:
    return _events_dir(tmp_path_factory, request.param)


@pytest.mark.parametrize("key", KEYS)
def test_seeded_events_match_oracle(spark, seeded_dir, key):
    rows = _compare(spark, key, seeded_dir)
    assert rows, f"{key} produced no rows on the seeded fixture"
