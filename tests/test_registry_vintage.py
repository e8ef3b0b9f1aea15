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
def green_rounds() -> dict[str, list[int]]:
    """key -> sorted rounds with a full green verdict, from the files."""
    greens: dict[str, set[int]] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        newest = max(newest, rnd)
        for key, verdict in data.items():
            if isinstance(verdict, dict) and _green(verdict):
                greens.setdefault(key, set()).add(rnd)
    assert greens, "no CORRECTNESS files found — run from the repo root"
    out = {k: sorted(v) for k, v in greens.items()}
    out["__newest__"] = [newest]
    return out


def test_fold_matches_recorded_verdicts(green_rounds):
    """The fold equals latest-green-as-of-the-folded-round, <=1 round old.

    The driver writes CORRECTNESS_r{N}.json at the END of round N; the
    r{N} fold lands at the START of round N+1. So the fold may lag the
    newest file by at most one round, and within the rounds it HAS
    folded, every entry must be the key's true latest green."""
    newest_file_round = green_rounds["__newest__"][0]
    folded_max = max(R._VERDICT_ROUND.values())
    assert newest_file_round - folded_max <= 1, (
        f"fold covers only r<= {folded_max} but CORRECTNESS files reach "
        f"r{newest_file_round} — fold is >1 round stale, update "
        "_VERDICT_ROUND (and refresh _STALE_REGRADE/_DEFER_NEXT_ROUND)"
    )
    for key, folded in R._VERDICT_ROUND.items():
        greens = [
            r for r in green_rounds.get(key, []) if r <= folded_max
        ]
        assert greens, (
            f"{key} is folded at r{folded} but has no green verdict in "
            f"any CORRECTNESS file up to r{folded_max}"
        )
        assert folded == max(greens), (
            f"{key}: latest green within folded rounds is r{max(greens)} "
            f"but fold says r{folded}"
        )


def test_vintage_floor_is_rolling():
    """Folded verdicts stay within the rolling window the budget allows.

    With up to 4x50 = 200 grading slots per 4-round window, a spread of
    3 is achievable while the surface is <= 200 keys MINUS the round's
    rank-(0,0) demand; the explicit `_DEFER_NEXT_ROUND` set absorbs the
    overflow (verified exactly in test_prefix_covers_floor_and_rank0).
    A key may sit past the window only while it is explicitly deferred
    (at most one round, by construction) or already at the head of the
    current grading prefix — i.e. the staleness is being lifted THIS
    round. Anything else is silent drift and fails loudly."""
    newest = max(R._VERDICT_ROUND.values())
    prefix = set(list(R.registry().keys())[:PREFIX_BUDGET])
    over = {
        k
        for k, v in R._VERDICT_ROUND.items()
        if newest - v > 3
        and k not in R._DEFER_NEXT_ROUND
        and k not in prefix
    }
    assert not over, (
        f"keys older than the 4-round window, not explicitly deferred, "
        f"and not in this round's grading prefix: {sorted(over)}"
    )


def test_prefix_covers_floor_and_rank0():
    """One driver round must lift the floor, minus the explicit deferral."""
    keys = list(R.registry().keys())
    prefix = set(keys[:PREFIX_BUDGET])
    floor = min(R._VERDICT_ROUND.values())
    floor_keys = {k for k, v in R._VERDICT_ROUND.items() if v == floor}
    rank0 = {k for k in keys if R._rank(k) == (0, 0)}
    # demand is the UNION: a floor-vintage key that is ALSO stale-marked
    # occupies one slot, not two (first round with overlap: r22, where
    # six r17 keys are in the optimization-touched stale cohort)
    overflow = max(0, len(rank0 | floor_keys) - PREFIX_BUDGET)
    assert len(R._DEFER_NEXT_ROUND) == overflow, (
        f"deferral set must absorb the budget overflow exactly: "
        f"{len(rank0)} rank-0 | {len(floor_keys)} floor keys = "
        f"{len(rank0 | floor_keys)} demanded vs budget "
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


# Keys whose LATEST recorded grade legitimately-or-knowingly carries zero
# oracle rows. A 0-row hash match certifies schema only — the operator
# could be arbitrarily wrong and still grade green — so every entry here
# is either scheduled to be made discriminating (with the round) or must
# carry a rationale. Remove each key when its fix re-grades non-empty.
VACUOUS_EMPTY_ALLOWED: set[str] = set()
# (join_anti and rule_b10_cross_sell self-expired with CORRECTNESS_r16:
# both now grade non-empty — 5 and 83 oracle rows — so the whitelist is
# empty for the first time since the r15 vacuousness audit.)


def test_latest_grades_are_not_vacuously_empty(green_rounds):
    """No key's latest green verdict may rest on a 0-row result.

    The r15 vacuousness audit over recorded `oracle_rows` found two keys
    grading green on structurally empty results (the fn_collation class
    of hazard, caught there by hand). This pins the audit: any future
    key — or fixture regeneration — that drains a graded result to zero
    rows fails here instead of silently certifying nothing."""
    # fold in NUMERIC round order (ADVICE r16 #2): lexicographic order
    # breaks at round 100+ (r100 sorts before r16)
    latest: dict[str, tuple[int, int | None]] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(os.path.basename(p).split("_r")[1].split(".")[0]),
    ):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for key, v in data.items():
            if isinstance(v, dict) and _green(v):
                latest[key] = (rnd, v.get("oracle_rows"))
    empty = {
        k: rnd
        for k, (rnd, n) in latest.items()
        if n == 0 and k not in VACUOUS_EMPTY_ALLOWED
    }
    assert not empty, (
        f"keys whose latest green grade is a 0-row match: {empty} — make "
        "the query discriminating on the fixture or whitelist with a "
        "rationale in VACUOUS_EMPTY_ALLOWED"
    )
    stale_whitelist = {
        k
        for k in VACUOUS_EMPTY_ALLOWED
        if k in latest and latest[k][1] not in (0, None)
    }
    assert not stale_whitelist, (
        f"whitelisted keys now grade non-empty — drop them from "
        f"VACUOUS_EMPTY_ALLOWED: {sorted(stale_whitelist)}"
    )
