"""Verdict-freshness invariants over the registry's grading ranks.

The driver grades a 50-key prefix of ``registry()`` per round and records
the per-key verdicts in ``CORRECTNESS_r{N}.json``. ``_VERDICT_ROUND`` is
the hand-folded "latest green round" table that ranks keys by verdict age
so the rolling 50-key window re-certifies the stalest verdicts first.

These tests make drift loud (VERDICT r7 "Next round" #1/#8):

- the fold must agree with the recorded CORRECTNESS files (a key may lag
  the files by at most ONE round — the round in flight when the fold was
  last updated);
- the vintage floor must keep rising: no key's folded verdict may be more
  than 3 rounds older than the freshest fold (after the r7 fold the floor
  is r4; after r8's grading it becomes r5, and so on);
- the 50-key grading prefix must contain EVERY key at the current floor
  plus every rank-(0,0) key (new / stale-regrade), so one driver round is
  always enough to lift the floor.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from fintech_data_lake_as_code_spark import registry as R

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREFIX_BUDGET = 50  # keys the driver grades per round


def _green(v: dict) -> bool:
    return bool(
        v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    ) and not v.get("err")


@pytest.fixture(scope="module")
def latest_green() -> dict[str, int]:
    """key -> highest round with a full green verdict, from the files."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for key, verdict in data.items():
            if isinstance(verdict, dict) and _green(verdict):
                latest[key] = max(latest.get(key, 0), rnd)
    assert latest, "no CORRECTNESS files found — run from the repo root"
    return latest


def test_fold_matches_recorded_verdicts(latest_green):
    """Every folded round is a real green round, at most 1 round stale."""
    newest_file_round = max(latest_green.values())
    for key, folded in R._VERDICT_ROUND.items():
        assert key in latest_green, (
            f"{key} is folded at r{folded} but has no green verdict in any "
            "CORRECTNESS file"
        )
        assert folded <= latest_green[key], (
            f"{key} folded at r{folded} but latest recorded green is "
            f"r{latest_green[key]} — the fold claims a verdict that "
            "doesn't exist"
        )
        # The fold may lag the files by exactly the in-flight round: when
        # the driver writes CORRECTNESS_r{N}.json, the r{N} fold lands at
        # the start of round N+1. More than one round behind is drift.
        if latest_green[key] == newest_file_round:
            assert latest_green[key] - folded <= 1, (
                f"{key}: latest green r{latest_green[key]} but fold says "
                f"r{folded} — fold is >1 round stale, update "
                "_VERDICT_ROUND"
            )
        else:
            assert folded == latest_green[key], (
                f"{key}: latest green r{latest_green[key]} (not the "
                f"newest file) but fold says r{folded}"
            )


def test_vintage_floor_is_rolling(latest_green):
    """Folded verdicts stay within the rolling window the budget allows.

    With up to 4x50 = 200 grading slots per 4-round window, a spread of
    3 is achievable while the surface is <= 200 keys MINUS the round's
    rank-(0,0) demand; the explicit `_DEFER_NEXT_ROUND` set absorbs the
    overflow (verified exactly in test_prefix_covers_floor_and_rank0),
    so only deferred keys may sit one round past the window."""
    newest = max(R._VERDICT_ROUND.values())
    over = {
        k
        for k, v in R._VERDICT_ROUND.items()
        if newest - v > 3 and k not in R._DEFER_NEXT_ROUND
    }
    assert not over, (
        f"keys older than the 4-round window and not explicitly "
        f"deferred: {sorted(over)}"
    )


def test_prefix_covers_floor_and_rank0():
    """One driver round must lift the floor, minus the explicit deferral."""
    keys = list(R.registry().keys())
    prefix = set(keys[:PREFIX_BUDGET])
    floor = min(R._VERDICT_ROUND.values())
    floor_keys = {k for k, v in R._VERDICT_ROUND.items() if v == floor}
    rank0 = {k for k in keys if R._rank(k) == (0, 0)}
    overflow = max(0, len(rank0) + len(floor_keys) - PREFIX_BUDGET)
    assert len(R._DEFER_NEXT_ROUND) == overflow, (
        f"deferral set must absorb the budget overflow exactly: "
        f"{len(rank0)} rank-0 + {len(floor_keys)} floor keys vs budget "
        f"{PREFIX_BUDGET} -> overflow {overflow}, but _DEFER_NEXT_ROUND "
        f"has {len(R._DEFER_NEXT_ROUND)}"
    )
    missing_floor = floor_keys - prefix - R._DEFER_NEXT_ROUND
    missing_rank0 = rank0 - prefix
    assert not missing_rank0, (
        f"rank-(0,0) keys outside the 50-key prefix: {sorted(missing_rank0)}"
    )
    assert not missing_floor, (
        f"r{floor}-vintage keys outside the 50-key prefix: "
        f"{sorted(missing_floor)} — they will not be re-certified this "
        "round and the floor cannot rise"
    )
    deferred_in_prefix = R._DEFER_NEXT_ROUND & prefix
    assert not deferred_in_prefix, (
        f"deferred keys must rank BEHIND the prefix: {deferred_in_prefix}"
    )


def test_stale_set_keys_exist():
    """_STALE_REGRADE must reference registered keys only."""
    keys = set(R.registry().keys())
    unknown = set(R._STALE_REGRADE) - keys
    assert not unknown, f"stale-regrade names not in registry: {sorted(unknown)}"
