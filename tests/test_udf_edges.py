"""Planted edge cases for the Python-surface keys (r13 latent-backlog
fixes): NULL text through the UDTF and the multimodal codecs, and exact
.5-cent ties through the cogrouped/vectorized pandas lanes. Each test
runs the REGISTERED query against a crafted parquet dir and compares it
to the key's own DuckDB oracle — the same contract the driver grades,
on inputs the shipped fixtures never produce."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _compare(spark, key: str, edge_dir: str):
    """Run the registered query and its oracle on edge_dir, canonical
    column-sorted stringified row compare (the driver's shape)."""
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs[key](spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(edge_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    orows = con.execute(oracles[key]).fetchall()
    ocols = [d[0] for d in con.description]

    def canon(cols, rows):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in idx:
                v = r[i]
                if isinstance(v, float):
                    v = f"{v:.6f}"
                vals.append(str(v))
            out.append("\x1f".join(vals))
        return sorted(cols), sorted(out)

    got, exp = canon(sdf.columns, srows), canon(ocols, orows)
    assert got[0] == exp[0], f"{key} columns: {got[0]} vs {exp[0]}"
    assert got[1] == exp[1], f"{key} values diverge"
    return srows


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    """documents with a NULL-text row; events/orders with exact .5-cent
    ties (value * 100 lands on a binary-exact .5, where banker's and
    half-away-from-zero rounding differ by one cent)."""
    d = str(tmp_path_factory.mktemp("edge_sf"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([6, 12, 18], type=pa.int64()),
                "text": pa.array(
                    ["the quick brown fox", None, "a of and to in is"],
                    type=pa.string(),
                ),
                "lang": pa.array(["en", "en", "en"], type=pa.string()),
                "source": pa.array(["web", "web", "web"], type=pa.string()),
                "n_chars": pa.array([19, 0, 17], type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    # 0.125 * 100 == 12.5 exactly; banker's gives 12, half-away gives 13.
    # -0.125 pins the sign-symmetric case. Four events for user 1 (>= 3
    # HAVING floor), gaps 10s/20s/40s in exact microseconds. User 3
    # carries a NULL value: the oracle's SUM ignores it, so the pandas
    # lane must dropna, never let a NaN poison the int64 cents sum.
    ts = [1_700_000_000_000_000 + us for us in (0, 10_000_000, 30_000_000, 70_000_000)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "ts": pa.array(ts + ts[:2], type=pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 1, 3, 3], type=pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "view", "click", "view", "error"],
                    type=pa.string(),
                ),
                "value": pa.array(
                    [0.125, -0.125, 2.375, 1.0, None, 0.625],
                    type=pa.float64(),
                ),
                "props": pa.array(["{}"] * 6, type=pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11], type=pa.int64()),
                "o_custkey": pa.array([1, 2], type=pa.int64()),
                "o_orderstatus": pa.array(["O", "F"], type=pa.string()),
                "o_totalprice": pa.array([0.125, 7.625], type=pa.float64()),
                "o_orderdate": pa.array(
                    [1_700_000_000_000_000] * 2, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "2-HIGH"], type=pa.string()
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    return d


def test_udtf_expand_null_text_emits_no_rows(spark, edge_dir):
    rows = _compare(spark, "udtf_expand", edge_dir)
    # the NULL doc contributes nothing; the two real docs tokenize
    assert {r[0] for r in rows} == {6, 18}
    assert len(rows) == 4 + 6


def test_multimodal_decode_null_payload_yields_null_fields(spark, edge_dir):
    rows = _compare(spark, "multimodal_decode", edge_dir)
    by_id = {r[0]: r for r in rows}
    assert set(by_id) == {6, 12, 18}
    assert all(v is None for v in by_id[12][1:]), by_id[12]
    assert all(v is not None for v in by_id[6][1:])


def test_framesample_null_payload_emits_no_frames(spark, edge_dir):
    rows = _compare(spark, "multimodal_framesample", edge_dir)
    assert {r[0] for r in rows} == {6, 18}


def test_cogrouped_cents_round_half_away_from_zero(spark, edge_dir):
    rows = _compare(spark, "udf_cogrouped", edge_dir)
    by_user = {r[0]: r for r in rows}
    # user 1 events: 12.5 + (-12.5) + 237.5 + 100 cents, half-away:
    # 13 - 13 + 238 + 100 = 338 (banker's would give 12 - 12 + 238 + 100)
    assert by_user[1][3] == 338, by_user[1]
    # order ties: 0.125 -> 13 (user 1), 7.625 -> 763 (user 2)
    assert by_user[1][4] == 13
    assert by_user[2][4] == 763
    # user 3's NULL value is ignored (not NaN-poisoned): 62.5 -> 63
    assert by_user[3][3] == 63


def test_vectorized_agg_integer_moments(spark, edge_dir):
    import math

    rows = _compare(spark, "udf_vectorized_agg", edge_dir)
    assert len(rows) == 1 and rows[0][0] == 1 and rows[0][1] == 4
    # gaps: 10s, 20s, 40s in exact microseconds -> exact integer moments
    gaps = [10_000_000, 20_000_000, 40_000_000]
    n, sx = len(gaps), sum(gaps)
    sxx = sum(g * g for g in gaps)
    exp = round(
        math.sqrt(float(n * sxx - sx * sx) / float(n) / float(n - 1)) / 1e6, 4
    )
    assert rows[0][2] == exp


def test_text_fingerprint_long_doc_no_overflow(spark, tmp_path):
    """A ~200k-word document must fingerprint without overflow.

    Pre-r16, `text_fingerprint` applied `% 1e9+7` only AFTER the full
    position-weighted sum; terms grow as ~4061*i^2, so this document's
    raw sum exceeds 2^63-1 and Spark's ANSI-mode BIGINT sum hard-fails
    with ARITHMETIC_OVERFLOW (asserted arithmetically below — the raw
    sum is recomputed here in Python bignums). The r16 form reduces each
    term mod M before summing (mod distributes over addition, so the
    result is unchanged wherever both are defined) and must match the
    hand-computed bignum truth. The truth stands in for the DuckDB
    oracle HERE because the oracle's lateral
    UNNEST(generate_series(1, len(parts))) carries the whole 200k-item
    list on every emitted row — quadratic at this doc length (it never
    is at grade scale, where fixture docs are short); Spark-vs-oracle
    agreement on ordinary docs is certified by the driver grade."""
    M = 1_000_000_007
    cycle = ["alpha", "bb", "ccc", "dddd"]
    long_words = [cycle[i % 4] for i in range(200_000)]
    docs = {
        7: "the quick brown fox",
        9: " ".join(long_words),
    }
    d = str(tmp_path / "longdoc_sf")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), type=pa.int64()),
                "text": pa.array([docs[k] for k in sorted(docs)], type=pa.string()),
                "lang": pa.array(["en", "en"], type=pa.string()),
                "source": pa.array(["web", "web"], type=pa.string()),
                "n_chars": pa.array(
                    [len(docs[k]) for k in sorted(docs)], type=pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    def term(i: int, w: str) -> int:
        return ((i * 31 + len(w)) * 131 + ord(w[0])) * i

    raw_sum = sum(term(i + 1, w) for i, w in enumerate(long_words))
    assert raw_sum > 2**63 - 1, (
        "planted doc no longer overflows the pre-fix unreduced sum — "
        f"raw sum {raw_sum} <= int64 max; lengthen the document"
    )
    expected = {
        doc_id: sum(
            term(i + 1, w) % M for i, w in enumerate(text.split(" "))
        )
        % M
        for doc_id, text in docs.items()
    }

    sdf = entry.queries()["text_fingerprint"](spark, d)
    got = {r[0]: r[1] for r in sdf.collect()}
    assert got == expected


def test_collation_literals_are_in_domain(spark, sf_dir):
    """The UTF8_LCASE equality and ordering counts must SPLIT the data:
    the pre-r15 out-of-domain literals ('web', 'n') matched 0 rows and
    all rows respectively, so a collation regression graded green.
    With 'src7'/'src15' over the src0..src19 tag universe both counts
    sit strictly between 0 and n_rows."""
    from fintech_data_lake_as_code_spark.registry import registry as reg

    rows = reg()["fn_collation"].fn(spark, sf_dir).collect()
    tot = sum(r.n_rows for r in rows)
    eq = sum(r.n_src7_ci for r in rows)
    ge = sum(r.n_ge_src15_ci for r in rows)
    assert 0 < eq < tot
    assert 0 < ge < tot
