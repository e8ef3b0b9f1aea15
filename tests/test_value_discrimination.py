"""Machine-checked "discriminates through its VALUES" audit (VERDICT r15
"Next round" #8 — the final step of the vacuousness-audit ladder).

A key whose grade rests on one or two rows is the easiest to certify
vacuously: a 0-row result certifies schema only (pinned by
test_registry_vintage), but a 1-row result whose value never moves is
barely better — a constant would grade green forever. This module
closes that gap mechanically: for EVERY key whose latest recorded
driver grade carries <= 2 oracle rows (computed live from the
CORRECTNESS files, so new tiny-grade keys are swept in automatically),
run the registered query twice — once on sf0.001 and once on a
PERTURBED copy (every 7th row dropped from every table; float value
columns scaled; one whole embedding label removed) — and assert the
canonical value-hash FLIPS. A key that returns the same values on
materially different input is not being certified by its grade.

The perturbation is input-side only and table-agnostic, so the check
needs no per-key knowledge; the three legs cover the three output
families seen in tiny-grade keys (row drops flip counts/sums, value
scaling flips thresholds/quantiles, the label drop flips
countDistinct(label) contract headers like sim_maxsim_ann's)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _round_of(path: str) -> int:
    return int(os.path.basename(path).split("_r")[1].split(".")[0])


def _latest_small_grade_keys() -> list[str]:
    """Keys whose latest green driver grade rests on <= 2 oracle rows.

    Files are folded in NUMERIC round order (ADVICE r16 #2): plain
    lexicographic sort holds for the zero-padded r01–r99 names but would
    silently pick the wrong "latest" at round 100+ (r100 sorts before
    r16), the same parse test_registry_vintage.green_rounds uses."""
    latest: dict[str, int | None] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=_round_of
    ):
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for key, v in data.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                latest[key] = v.get("oracle_rows")
    return sorted(
        k for k, n in latest.items() if n is not None and n <= 2
    )


def _perturb(table: pa.Table, name: str) -> pa.Table:
    """Deterministic, schema-preserving input perturbation:
    - drop every 7th row (flips counts, sums, set memberships);
    - scale float64 columns by 1.37 (flips thresholds, quantiles,
      shares — deliberately not a round factor);
    - embeddings only: drop label 0 entirely (flips the
      countDistinct(label) headers of the recall-contract keys, which
      survive uniform row thinning);
    - events only: drop the max user_id entirely (flips the distinct-ID
      DOMAIN summaries — scan_text's n_ids/max_id survive thinning
      because every user keeps some events; first run caught this)."""
    n = table.num_rows
    table = table.take([i for i in range(n) if i % 7 != 0])
    if name == "embeddings" and "label" in table.column_names:
        table = table.filter(pc.not_equal(table.column("label"), 0))
    if name == "events" and "user_id" in table.column_names:
        umax = pc.max(table.column("user_id"))
        table = table.filter(pc.not_equal(table.column("user_id"), umax))
    for i, field in enumerate(table.schema):
        if pa.types.is_float64(field.type):
            scaled = pc.multiply(table.column(i), 1.37)
            table = table.set_column(i, field, scaled.cast(field.type))
    return table


@pytest.fixture(scope="module")
def perturbed_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("perturbed_sf"))
    for t in _TABLES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(
                _perturb(pq.read_table(src), t),
                os.path.join(d, f"{t}.parquet"),
            )
    return d


def _canon_hash(df) -> tuple:
    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        d = r.asDict()
        vals = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        rows.append("\x1f".join(vals))
    return tuple(cols), tuple(sorted(rows))


def _params():
    keys = _latest_small_grade_keys()
    slow = pytest.mark.slow
    return [
        pytest.param(k, marks=slow) if k.startswith("stream_") else k
        for k in keys
    ]


@pytest.mark.parametrize("key", _params())
def test_small_grade_key_discriminates_on_values(spark, perturbed_dir, key):
    qs = entry.queries()
    assert key in qs, f"{key} graded <=2 rows but is not registered"
    base_cols, base_rows = _canon_hash(qs[key](spark, BASE_SF))
    pert_cols, pert_rows = _canon_hash(qs[key](spark, perturbed_dir))
    assert base_cols == pert_cols, f"{key}: schema moved under perturbation"
    assert base_rows != pert_rows, (
        f"{key}: canonical values identical on materially perturbed "
        f"input ({base_rows!r}) — the grade does not discriminate "
        "through its values"
    )
