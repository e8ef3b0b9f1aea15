"""Planted fixtures for branches the shipped testdata never exercises
(r15 constant-column audit): the fixture corpus grades these keys green
through VALUE variance, but three semantic legs stay fixture-dead —
snapshot-diff's inserted/unchanged classifications (every sf0.01 user
updates), containment's partial band (every planted excerpt is exactly
10000 bp), and triangle counting's degree orientation on an IRREGULAR
graph (the sf supplier projection is complete, so every node counts the
same). Each test runs the REGISTERED query against a crafted parquet
dir AND compares it to the key's own DuckDB oracle (the driver's
contract, via test_udf_edges._compare), then asserts the hand-computed
ground truth on top."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_udf_edges import _compare


@pytest.fixture(scope="module")
def diff_dir(tmp_path_factory) -> str:
    """events where the snapshot cut (mid-range of event time) splits
    users three ways: user 1 only before the cut (unchanged), user 2
    only after (inserted), user 3 on both sides with a NEGATIVE cents
    delta. min ts 1000s / max 5000s -> cut at 3000s."""
    d = str(tmp_path_factory.mktemp("diff_sf"))
    secs = [1000, 5000, 1500, 4000]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 20, 30, 31], type=pa.int64()),
                "ts": pa.array(
                    [s * 1_000_000 for s in secs], type=pa.timestamp("us")
                ),
                "user_id": pa.array([1, 2, 3, 3], type=pa.int64()),
                "event_type": pa.array(
                    ["view", "purchase", "view", "click"], type=pa.string()
                ),
                "value": pa.array([10.0, 7.25, 20.0, 5.25], type=pa.float64()),
                "props": pa.array(["{}"] * 4, type=pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def test_snapshot_diff_classifies_all_three_kinds(spark, diff_dir):
    rows = _compare(spark, "cdc_snapshot_diff", diff_dir)
    by_user = {r[0]: tuple(r[1:]) for r in rows}
    # (change_kind, old_event_id, new_event_id, cents_delta)
    assert by_user[1] == ("unchanged", 10, 10, 0)
    assert by_user[2] == ("inserted", None, 20, 725)
    assert by_user[3] == ("updated", 30, 31, 525 - 2000)
    assert len(rows) == 3


@pytest.fixture(scope="module")
def contain_dir(tmp_path_factory) -> str:
    """documents where containment is PARTIAL: doc 1 (12 shingles) has
    11 of them inside doc 2 (16 shingles) -> 9166 bp, in the open band
    (9000, 10000) the shipped excerpts never hit; doc 3 shares only 8
    -> 6666 bp, below threshold, must be excluded. No doc_id % 7 == 0,
    so the operator's own excerpt planting stays out of the corpus."""
    d = str(tmp_path_factory.mktemp("contain_sf"))
    a_words = [f"a{i}" for i in range(1, 15)]  # 14 words, 12 shingles
    b_words = a_words[:13] + [f"z{i}" for i in range(1, 6)]  # 18 w, 16 sh
    c_words = a_words[:10] + [f"w{i}" for i in range(1, 7)]  # 16 w, 14 sh
    texts = [" ".join(w) for w in (a_words, b_words, c_words)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * 3, type=pa.string()),
                "source": pa.array(["web"] * 3, type=pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_containment_partial_band_and_threshold_exclusion(
    spark, contain_dir
):
    rows = _compare(spark, "dedup_containment", contain_dir)
    # exactly ONE pair: doc 1 is 11/12-contained in doc 2 (9166 bp);
    # doc 3's 8/12 (6666 bp) and 8/14 overlaps sit below 9000 everywhere
    assert [tuple(r) for r in rows] == [(1, 2, 12, 16, 11 * 10000 // 12)]


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory) -> str:
    """lineitem encoding an IRREGULAR supplier co-occurrence graph: a K4
    on {1,2,3,4} plus edges (4,5), (1,5), (5,6) — degrees 4/3/3/5/3/1,
    triangles {123,124,134,234,145} — with every edge planted at exactly
    TRI_MIN_SUPPORT distinct orders, plus one edge (2,5) at support
    TRI_MIN_SUPPORT - 1 that MUST be pruned (it would close {1,2,5} and
    {2,4,5} and corrupt four nodes' counts if the floor broke)."""
    from fintech_data_lake_as_code_spark.operators.graph import (
        TRI_MIN_SUPPORT,
    )

    d = str(tmp_path_factory.mktemp("graph_sf"))
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (1, 5), (5, 6),
    ]
    orderkeys, suppkeys = [], []
    for i, (u, v) in enumerate(edges):
        for rep in range(TRI_MIN_SUPPORT):
            o = 100 * i + rep
            orderkeys += [o, o]
            suppkeys += [u, v]
    for rep in range(TRI_MIN_SUPPORT - 1):  # under-supported (2, 5)
        o = 100 * len(edges) + rep
        orderkeys += [o, o]
        suppkeys += [2, 5]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, type=pa.int64()),
                "l_suppkey": pa.array(suppkeys, type=pa.int64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    return d


def test_triangle_count_on_planted_irregular_graph(spark, graph_dir):
    rows = _compare(spark, "graph_triangle_count", graph_dir)
    # hand count: nodes 1 and 4 sit in 4 triangles each, 2 and 3 in the
    # K4's 3, node 5 only in {1,4,5}; node 6 closes none and is absent
    assert [tuple(r) for r in rows] == [
        (1, 4), (4, 4), (2, 3), (3, 3), (5, 1),
    ]
