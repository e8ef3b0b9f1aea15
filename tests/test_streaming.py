"""Streaming semantics tests (SURVEY.md §5.5): bounded file-stream runs
with deterministic micro-batches. The oracle-backed streaming keys are
covered by test_oracle.py; this file asserts the behaviors the driver only
rows-only-checks — late-data drop under watermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import load
from fintech_data_lake_as_code_spark.streaming.queries import (
    EVENTS_SCHEMA,
    freeze_flagged,
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


def test_freeze_state_survives_micro_batch_boundary(spark, tmp_path):
    """The freeze state machine must keep working when a user's history
    spans micro-batches: not-frozen state (the -1 sentinel) written by
    batch 1 must decode back to None so a first overdraft in batch 2 still
    freezes the account. maxFilesPerTrigger=1 forces one file per batch."""
    import json
    import os

    src = str(tmp_path / "freeze_src")
    os.makedirs(src)
    base = "2024-01-01 00:0{m}:00"

    mtime = [1_700_000_000]

    def write_file(name, rows):
        path = os.path.join(src, name)
        with open(path, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        # the file source orders batches by mtime — make it deterministic
        mtime[0] += 60
        os.utime(path, (mtime[0], mtime[0]))

    # batch 1: deposit 100, purchase 50 -> balance +50, never frozen
    write_file(
        "b1.json",
        [
            {"event_id": 1, "ts": base.format(m=1), "user_id": 7,
             "event_type": "deposit", "value": 100.0, "props": "{}"},
            {"event_id": 2, "ts": base.format(m=2), "user_id": 7,
             "event_type": "purchase", "value": 50.0, "props": "{}"},
        ],
    )
    # batch 2: purchase 100 -> balance -50 => FIRST overdraft happens here,
    # after a state round-trip; the next event falls inside the 24h window.
    write_file(
        "b2.json",
        [
            {"event_id": 3, "ts": base.format(m=3), "user_id": 7,
             "event_type": "purchase", "value": 100.0, "props": "{}"},
            {"event_id": 4, "ts": base.format(m=4), "user_id": 7,
             "event_type": "deposit", "value": 10.0, "props": "{}"},
        ],
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    name = "freeze_multibatch_sink"
    q = (
        freeze_flagged(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.event_id, r.frozen_at_epoch) for r in spark.table(name).collect()}

    frozen_at = spark.sql(
        f"SELECT unix_timestamp(timestamp'{base.format(m=3)}')"
    ).first()[0]
    assert got == {(4, frozen_at)}, (
        "event 4 (inside the freeze window opened by a later-batch "
        f"overdraft) must be flagged; got {got}"
    )


def test_checkpoint_restart_processes_only_new_files(spark, sf_dir, tmp_path):
    """Exactly-once across restart: a checkpointed availableNow stream run
    twice — with new files landed in between — must deliver every row
    exactly once (the DMS-task-state property the lake's checkpoint
    replaces, reference lib/fin-transactions-stack.ts:161)."""
    import os

    from pyspark.sql import types as T

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )

    def run_once():
        stream = spark.readStream.schema(schema).json(src)
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).json(src)
    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 100

    # land a second batch; restart from the SAME checkpoint
    spark.range(100, 150).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).json(src)
    run_once()
    final = spark.read.parquet(out)
    assert final.count() == 150, "restart must process only the new files"
    assert final.select("id").distinct().count() == 150, "no row delivered twice"
    assert final.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(150))


def test_tws_processor_state_transitions():
    # exercises the transformWithStateInPandas StatefulProcessor's actual
    # transition code protobuf-free: a fake ValueState handle stands in
    # for the state server (the only layer the missing google.protobuf
    # dependency gates), so the per-key accumulate/sort/emit logic — the
    # part that produces graded output on a real cluster — runs here
    import pandas as pd

    from fintech_data_lake_as_code_spark.streaming.queries import (
        make_running_totals_processor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    proc = make_running_totals_processor()
    handle = FakeHandle()
    proc.init(handle)

    # micro-batch 1 for user 42: two Arrow chunks, deliberately out of
    # event-time order across chunks — concat-then-sort must fix it
    b1 = [
        pd.DataFrame({"event_id": [3], "ts": [30], "value": [1.25]}),
        pd.DataFrame({"event_id": [1, 2], "ts": [10, 20], "value": [0.5, 2.0]}),
    ]
    (out1,) = list(proc.handleInputRows((42,), iter(b1), None))
    assert out1.values.tolist() == [
        [1, 42, 1, 50],
        [2, 42, 2, 250],
        [3, 42, 3, 375],
    ]

    # micro-batch 2: state must carry across batches
    b2 = [pd.DataFrame({"event_id": [4], "ts": [40], "value": [0.25]})]
    (out2,) = list(proc.handleInputRows((42,), iter(b2), None))
    assert out2.values.tolist() == [[4, 42, 4, 400]]
    assert handle.states["totals"].get() == (4, 400)
    proc.close()


def test_tws_real_path_matches_twin(spark, sf_dir):
    """The REAL transformWithStateInPandas path (protobuf state server in
    the Python workers) must produce exactly the rows of its
    applyInPandasWithState twin. The pytest session is built by
    session.get_spark, which discovers an on-disk protobuf runtime and
    propagates it to workers before the JVM starts (compat.py) — so
    locally this exercises the genuine TWS branch, not the fallback."""
    import pytest

    from fintech_data_lake_as_code_spark.compat import tws_supported
    from fintech_data_lake_as_code_spark.streaming import queries as SQ

    if not tws_supported(spark):
        pytest.skip("no protobuf runtime reachable by the Python workers")

    src = SQ._events_json_dir(spark, sf_dir)

    def run(impl, key):
        stream = spark.readStream.schema(SQ.EVENTS_SCHEMA).json(src)
        return sorted(
            tuple(r) for r in SQ._drain(impl(stream), key, "append").collect()
        )

    tws = run(SQ._running_totals_tws, "tws_real_probe")
    twin = run(SQ._running_totals_apiws, "tws_twin_probe")
    assert len(tws) > 0
    assert tws == twin


def test_tws_topk_real_path_matches_twin(spark, sf_dir):
    """The ListState TWS query must produce exactly the rows of its
    applyInPandasWithState twin (same fold, different state API)."""
    import pytest

    from fintech_data_lake_as_code_spark.compat import tws_supported
    from fintech_data_lake_as_code_spark.streaming import queries as SQ

    if not tws_supported(spark):
        pytest.skip("no protobuf runtime reachable by the Python workers")

    src = SQ._events_json_dir(spark, sf_dir)

    def run(impl, key):
        stream = spark.readStream.schema(SQ.EVENTS_SCHEMA).json(src)
        return sorted(
            tuple(r) for r in SQ._drain(impl(stream), key, "append").collect()
        )

    tws = run(SQ._topk_tws, "tws_topk_real_probe")
    twin = run(SQ._topk_apiws, "tws_topk_twin_probe")
    assert len(tws) > 0
    assert tws == twin


def test_topk_step_bounds_state_and_ranks_at_arrival():
    """Pure-python pin of the shared top-K transition: state stays
    bounded at K, rank-at-arrival counts only RETAINED better entries,
    and value ties break by event_id."""
    import pandas as pd

    from fintech_data_lake_as_code_spark.streaming.queries import (
        TWS_TOPK,
        _topk_step,
    )

    # batch 1: values 5, 3, 9 (ts order) -> ranks 0, 1, 0. `ts` carries
    # sub-second precision — the fold orders on it, not the truncated te.
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "ts": pd.to_datetime([10_100, 20_200, 30_300], unit="ms"),
            "te": [10, 20, 30],
            "value": [0.05, 0.03, 0.09],
        }
    )
    out1, st1 = _topk_step([], b1)
    assert [(o[0], o[3], o[4]) for o in out1] == [
        (1, 0, True),
        (2, 1, True),
        (3, 0, True),
    ]
    assert st1 == [(9, 3), (5, 1), (3, 2)]

    # batch 2: a low value ranks below the FULL retained top-3 (saturated
    # at K) and does not enter; an equal-to-max value loses the tie to
    # the earlier event_id
    b2 = pd.DataFrame(
        {
            "event_id": [4, 5],
            "user_id": [7, 7],
            "ts": pd.to_datetime([40_400, 50_500], unit="ms"),
            "te": [40, 50],
            "value": [0.01, 0.09],
        }
    )
    out2, st2 = _topk_step(st1, b2)
    assert [(o[0], o[3], o[4]) for o in out2] == [
        (4, TWS_TOPK, False),
        (5, 1, True),
    ]
    assert len(st2) == TWS_TOPK
    assert st2 == [(9, 3), (9, 5), (5, 1)]


def test_topk_step_orders_by_full_precision_ts_within_a_second():
    """Two same-user events inside ONE second whose event_id order
    disagrees with ts order must fold in ts order — the oracle defines
    'prior' by full-precision `p.ts < e.ts`, so a te-ordered fold would
    grade-mismatch on exactly this shape (ADVICE r6, medium)."""
    import pandas as pd

    from fintech_data_lake_as_code_spark.streaming.queries import _topk_step

    # event 9 happens FIRST (ts .100) with the HIGHER id; event 2 second
    # (ts .900). Both truncate to te=10. ts-order: id 9 (0.08) then
    # id 2 (0.05) -> ranks 0 then 1. A te+event_id fold would emit
    # id 2 first with rank 0 — wrong.
    b = pd.DataFrame(
        {
            "event_id": [2, 9],
            "user_id": [7, 7],
            "ts": pd.to_datetime([10_900, 10_100], unit="ms"),
            "te": [10, 10],
            "value": [0.05, 0.08],
        }
    )
    out, st = _topk_step([], b)
    assert [(o[0], o[3]) for o in out] == [(9, 0), (2, 1)]
    assert st == [(8, 9), (5, 2)]


def test_foreachbatch_merge_replay_is_idempotent(spark, tmp_path):
    """Exactly-once audit: re-delivering a micro-batch (same batch_id —
    what Spark does when it crashes between sink write and checkpoint
    commit) must leave the merged snapshot unchanged, both on the live
    merger and through a fresh post-crash instance; a half-written
    version (no _SUCCESS marker) must be rewritten, not trusted."""
    import datetime as dt
    import os
    import shutil

    from fintech_data_lake_as_code_spark.streaming.queries import (
        SnapshotMerger,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts timestamp",
        )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    root = str(tmp_path / "versions")
    m = SnapshotMerger(root)

    def snap(merger):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(merger.latest_dir()).collect()
        )

    b0 = mk([(1, 7, "view", 1.0, t0), (2, 8, "click", 2.0, t0 + sec)])
    b1 = mk([(3, 7, "purchase", 9.99, t0 + 2 * sec)])
    m.merge(b0, 0)
    m.merge(b1, 1)
    before = snap(m)

    # redelivery on the live merger: committed marker short-circuits
    m.merge(b1, 1)
    assert snap(m) == before

    # crash-restart: a FRESH merger over the same root replays batch 1 —
    # state must come off disk, and the snapshot must not change
    m2 = SnapshotMerger(root)
    m2.merge(b1, 1)
    assert snap(m2) == before

    # a half-written version (crash mid-write, no _SUCCESS) is rewritten
    b2 = mk([(4, 8, "view", 5.0, t0 + 3 * sec)])
    torn = os.path.join(root, "v2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    m2.merge(b2, 2)
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))
    latest = {
        r.user_id: r.event_id
        for r in spark.read.parquet(m2.latest_dir()).collect()
    }
    # user 7's purchase (batch 1) survived the restart; user 8 advanced
    assert latest == {7: 3, 8: 4}
    shutil.rmtree(root, ignore_errors=True)


def test_stream_dedup_postings_table_matches_stored_arrays(spark, tmp_path):
    """The streaming dedup index stores its state TWICE (shingle arrays
    for verification, bucketed prefix postings for candidates); the two
    must never drift: after any batch sequence — including a replay —
    the postings table must equal the prefix postings derivable from the
    committed arrays, batch for batch."""
    from fintech_data_lake_as_code_spark.operators.dedup import (
        _prefix_postings,
    )
    from fintech_data_lake_as_code_spark.streaming.queries import (
        IncrementalDedupIndex,
    )

    docs = spark.createDataFrame(
        [
            (i, f"document {i} holds a handful of shared words plus tag {i % 4}")
            for i in range(10)
        ],
        "doc_id bigint, text string",
    )
    w = IncrementalDedupIndex(str(tmp_path / "root"))
    w.process(docs.where(F.col("doc_id") < 4), 0)
    w.process(docs.where((F.col("doc_id") >= 4) & (F.col("doc_id") < 7)), 1)
    w.process(docs.where(F.col("doc_id") >= 7), 2)
    w.process(docs.where((F.col("doc_id") >= 4) & (F.col("doc_id") < 7)), 1)

    stored = {
        (r.batch_id, r.doc_id, r.n, r.pos, r.h)
        for r in spark.table(w.table).collect()
    }
    expected = set()
    for bid in (0, 1, 2):
        arrays = spark.read.parquet(
            str(tmp_path / "root" / "index" / f"batch_{bid}")
        ).withColumn("is_new", F.lit(True))
        expected |= {
            (bid, r.doc_id, r.n, r.pos, r.h)
            for r in _prefix_postings(arrays).collect()
        }
    assert stored == expected
    assert len(stored) == len(expected) > 0


def test_stream_dedup_worker_survives_empty_batches(spark, tmp_path):
    """An empty micro-batch (legal under several sources/triggers) must
    admit an empty generation and emit zero pairs without disturbing
    the pairs other batches emit."""
    from fintech_data_lake_as_code_spark.streaming.queries import (
        IncrementalDedupIndex,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id bigint, text string",
    )
    w = IncrementalDedupIndex(str(tmp_path / "root"))
    w.process(docs.where(F.col("doc_id") == 1), 0)
    w.process(docs.where(F.lit(False)), 1)  # empty batch
    w.process(docs.where(F.col("doc_id") == 2), 2)
    out = spark.read.parquet(str(tmp_path / "root") + "/pairs/batch_*")
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}


def test_committed_batch_dirs_lists_only_committed_generations(
    spark, tmp_path
):
    """The Hadoop-FS generation lister behind every foreachBatch worker
    (r10 latent finding: driver-local os/glob lists nothing on a
    non-local lake): only `<prefix><N>` DIRECTORIES carrying a _SUCCESS
    marker count, sorted by N, and the returned paths must be readable
    by spark.read.parquet (they come back as file:/ URIs)."""
    import os

    from fintech_data_lake_as_code_spark.streaming.queries import (
        _commit_marker_exists,
        _committed_batch_dirs,
    )

    root = str(tmp_path / "gens")
    # nothing there yet — and a missing root is an empty listing, not
    # an error (first batch of a fresh query)
    assert _committed_batch_dirs(spark, root, "v") == []

    df = spark.range(3).selectExpr("id AS k")
    df.write.mode("overwrite").parquet(os.path.join(root, "v0"))
    df.write.mode("overwrite").parquet(os.path.join(root, "v10"))
    # torn generation: files but no _SUCCESS -> invisible
    torn = os.path.join(root, "v5")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as fh:
        fh.write(b"junk")
    # foreign names and plain files -> invisible
    os.makedirs(os.path.join(root, "vNaN"))
    os.makedirs(os.path.join(root, "other_3"))
    with open(os.path.join(root, "v7"), "w") as fh:
        fh.write("a FILE named like a generation")

    got = _committed_batch_dirs(spark, root, "v")
    assert [bid for bid, _ in got] == [0, 10]
    for _, d in got:
        assert spark.read.parquet(d).count() == 3
    assert _commit_marker_exists(spark, os.path.join(root, "v10"))
    assert not _commit_marker_exists(spark, torn)


import pytest as _pytest


@_pytest.mark.parametrize("n_batches", [1, 2, 4])
def test_foreachbatch_merge_is_batching_invariant(spark, tmp_path, n_batches):
    """The merged snapshot must equal the batch latest-state REGARDLESS
    of how the stream was cut into micro-batches, including replays of
    every batch along the way — the composed exactly-once property
    (batch-side reduce + disk-recovering merge + committed-marker
    short-circuit) in one assertion."""
    import datetime as dt

    from fintech_data_lake_as_code_spark.streaming.queries import (
        SnapshotMerger,
    )

    t0 = dt.datetime(2026, 2, 1, 9, 0, 0)
    sec = dt.timedelta(seconds=1)
    # 12 events, 3 users, includes a same-(ts) tie broken by event_id
    events = [
        (i, 7 + (i % 3), ["view", "click", "purchase"][i % 3],
         float(i % 5) + 0.25, t0 + (i // 2) * sec)
        for i in range(12)
    ]
    # expected latest per user: max by (ts, event_id)
    expected = {}
    for eid, uid, etype, val, ts in events:
        cur = expected.get(uid)
        if cur is None or (ts, eid) > (cur[1], cur[0]):
            expected[uid] = (eid, ts, etype, val)

    schema = (
        "event_id bigint, user_id bigint, event_type string, "
        "value double, ts timestamp"
    )
    root = str(tmp_path / f"versions_{n_batches}")
    m = SnapshotMerger(root)
    size = len(events) // n_batches
    for b in range(n_batches):
        chunk = events[b * size : (b + 1) * size] or events[-size:]
        bdf = spark.createDataFrame(chunk, schema)
        m.merge(bdf, b)
        m.merge(bdf, b)  # immediate redelivery of every batch
    got = {
        r.user_id: (r.event_id, r.ts, r.event_type, r.value)
        for r in spark.read.parquet(m.latest_dir()).collect()
    }
    assert got == expected, (n_batches, got, expected)


def test_scd2_apply_out_of_order_and_replay(spark, tmp_path):
    """The streaming SCD-2 merger must splice a LATE batch (events
    earlier than already-applied ones) into history correctly — the
    final dimension must equal the from-scratch SCD-2 over all events —
    and inherit the replay discipline (re-delivered batch is a no-op,
    including through a fresh post-crash instance)."""
    import datetime as dt

    from fintech_data_lake_as_code_spark.streaming.queries import (
        Scd2Merger,
        _scd2_rows,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts timestamp",
        )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    root = str(tmp_path / "scd2_versions")
    mg = Scd2Merger(root)

    # batch 0 delivers the LATER events; batch 1 delivers an EARLIER one
    # for user 7 (late-arriving dimension change) plus a new user
    b0 = mk([(3, 7, "click", 3.0, t0 + 2 * m), (5, 8, "view", 5.0, t0)])
    b1 = mk([(1, 7, "signup", 1.0, t0), (6, 9, "view", 6.0, t0 + m)])
    mg.merge(b0, 0)
    mg.merge(b1, 1)

    def snap(merger):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(merger.latest_dir())
            .select("user_id", "event_id", "valid_from_epoch",
                    "valid_to_epoch", "is_current")
            .collect()
        )

    got = snap(mg)
    truth = sorted(
        tuple(r)
        for r in _scd2_rows(b0.unionByName(b1))
        .select("user_id", "event_id", "valid_from_epoch",
                "valid_to_epoch", "is_current")
        .collect()
    )
    assert got == truth
    # the late event must have OPENED user 7's history: event 1 closed
    # by event 3, event 3 current
    by_eid = {t[1]: t for t in got if t[0] == 7}
    assert by_eid[1][4] == 0 and by_eid[1][3] == by_eid[3][2]
    assert by_eid[3][4] == 1

    # replay on the live merger and through a fresh instance: no change
    mg.merge(b1, 1)
    assert snap(mg) == got
    mg2 = Scd2Merger(root)
    mg2.merge(b1, 1)
    assert snap(mg2) == got


def test_observed_metrics_equal_batch_recompute(spark, sf_dir):
    # the in-flight observe() counters summed across micro-batches must
    # equal the one-scan batch DQ aggregate row-for-row (same rule ids,
    # same counts, same verdicts) — the whole point of riding metrics on
    # the stream instead of re-scanning
    from fintech_data_lake_as_code_spark.operators.aggregates import (
        dq_expectations,
    )
    from fintech_data_lake_as_code_spark.streaming.queries import (
        stream_observe_metrics,
    )

    got = {
        r.rule_id: (r.n_rows, r.n_violations, r.passed)
        for r in stream_observe_metrics(spark, sf_dir).collect()
    }
    exp = {
        r.rule_id: (r.n_rows, r.n_violations, r.passed)
        for r in dq_expectations(spark, sf_dir).collect()
    }
    assert got == exp


def test_python_stream_source_equals_batch_source_multibatch(spark, sf_dir):
    # the streaming source must deliver exactly the batch source's rows
    # (no loss, no dup across offset boundaries), and the chunked offset
    # walk must produce a genuinely multi-batch drain
    from fintech_data_lake_as_code_spark.sources.datagen import N_ROWS
    from fintech_data_lake_as_code_spark.sources.pyds import (
        STREAM_CHUNK,
        scan_python_datasource,
        stream_python_datasource,
    )

    assert N_ROWS > STREAM_CHUNK, "chunk must force multiple batches"
    got = sorted(
        tuple(r) for r in stream_python_datasource(spark, sf_dir).collect()
    )
    exp = sorted(
        tuple(r) for r in scan_python_datasource(spark, sf_dir).collect()
    )
    assert len(got) == N_ROWS
    assert got == exp


def test_python_stream_reader_replay_is_consistent(spark):
    # exactly-once recovery hinges on readBetweenOffsets(start, end)
    # reproducing BYTE-identical rows for any committed range that
    # read() once returned — drive the reader contract directly
    from fintech_data_lake_as_code_spark.sources import pyds
    from fintech_data_lake_as_code_spark.sources.datagen import N_ROWS

    # capture the DataSource class _register_stream defines by handing it
    # a spy session, then drive the reader contract directly
    captured = {}

    class _Spy:
        def register(self, cls):
            captured["cls"] = cls

    class _FakeSession:
        dataSource = _Spy()

    pyds._register_stream(_FakeSession())
    ds = captured["cls"](options={})
    reader = ds.simpleStreamReader(ds.schema())

    off = reader.initialOffset()
    assert off == {"i": 0}
    seen = []
    for _ in range(100):
        start = dict(off)
        rows, off = reader.read(start)
        rows = list(rows)
        if not rows:
            assert off == start, "empty batch must not advance the offset"
            break
        replay = list(reader.readBetweenOffsets(start, off))
        assert replay == rows, (start, off)
        seen.extend(rows)
    assert len(seen) == N_ROWS
    assert len({r[0] for r in seen}) == N_ROWS, "row_ids must be unique"


def test_observe_metrics_survives_empty_landed_file(spark, sf_dir, tmp_path):
    # an empty landed object is a ZERO-ROW micro-batch; Spark still
    # reports the observation for it (count 0, NULL conditional sums) —
    # the drain must coalesce, not crash, and totals must equal the
    # batch recompute over the non-empty rows
    import shutil

    from fintech_data_lake_as_code_spark.streaming.queries import (
        _events_json_dir,
        observe_metrics_over,
    )

    src = _events_json_dir(spark, sf_dir)
    tmp = tmp_path / "landed"
    shutil.copytree(src, tmp)
    (tmp / "zz_empty.json").write_text("")  # sorts last: a 0-row batch
    got = {
        r.rule_id: (r.n_rows, r.n_violations, r.passed)
        for r in observe_metrics_over(spark, str(tmp)).collect()
    }
    exp = {
        r.rule_id: (r.n_rows, r.n_violations, r.passed)
        for r in observe_metrics_over(spark, src).collect()
    }
    assert got == exp


def test_observe_metrics_refuses_all_empty_feed(spark, tmp_path):
    # a feed of ONLY empty landed files must raise, never return a
    # green DQ verdict over zero rows (an upstream landing failure)
    import pytest as _pytest

    from fintech_data_lake_as_code_spark.streaming.queries import (
        observe_metrics_over,
    )

    tmp = tmp_path / "landed_empty"
    tmp.mkdir()
    (tmp / "a.json").write_text("")
    (tmp / "b.json").write_text("")
    with _pytest.raises(RuntimeError, match="zero rows"):
        observe_metrics_over(spark, str(tmp))


def test_py_cents_rounds_half_away_like_the_jvm_and_oracle():
    # The Python-side stateful folds must scale cents exactly like
    # Spark's F.round (HALF_UP) and DuckDB's ROUND (half away from
    # zero); Python's builtin round() banker's-rounds ties and would
    # drift one cent on an exact .5 double.
    import duckdb

    from fintech_data_lake_as_code_spark.streaming.queries import _py_cents

    cases = [0.125, 1.005, 2.675, 0.0, 3.14, 100.555, -0.125, -2.675]
    con = duckdb.connect()
    for v in cases:
        (exp,) = con.execute(
            "SELECT CAST(ROUND(? * 100, 0) AS BIGINT)", [v]
        ).fetchone()
        assert _py_cents(v) == exp, (v, _py_cents(v), exp)
    # the tie case builtin round() gets wrong (banker's): 0.125*100
    # is exactly 12.5 in binary floating point
    assert _py_cents(0.125) == 13 and round(0.125 * 100) == 12
    assert _py_cents(-0.125) == -13


def test_docs_landing_fingerprints_both_deriving_modules(spark, sf_dir):
    # ADVICE r10: the landed dedup corpus derives from io.load's
    # normalization AND dedup's perturbation — the _SEED marker must
    # bind BOTH module fingerprints so a change to either reseeds
    # (a single-module fingerprint silently served a stale corpus
    # against a freshly recomputed oracle).
    import os

    from fintech_data_lake_as_code_spark.streaming.queries import (
        _docs_json_dir,
    )

    src = _docs_json_dir(spark, sf_dir)
    with open(os.path.join(src, "_SEED")) as fh:
        fp = fh.read().strip()
    parts = fp.split(":")
    assert len(parts) == 2, fp
    assert all(
        len(p) == 64 and set(p) <= set("0123456789abcdef") for p in parts
    ), fp


def test_stream_dedup_incremental_replay_and_order_independence(
    spark, tmp_path
):
    """The streaming dedup worker must (1) emit each qualifying pair
    exactly once — the union over batches equals the batch all-pairs
    join regardless of how the corpus was cut into micro-batches or in
    what order they arrive, and (2) treat a re-delivered batch (same
    batch_id, Spark's crash-replay contract) as an idempotent overwrite,
    both on the live worker and through a fresh post-crash instance."""
    from fintech_data_lake_as_code_spark.streaming.queries import (
        IncrementalDedupIndex,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark structured streaming"),
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "another unrelated document concerning parquet file layouts"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    def run(root, batches):
        w = IncrementalDedupIndex(str(root))
        for bid, ids in enumerate(batches):
            w.process(df.where(F.col("doc_id").isin(ids)), bid)
        out = spark.read.parquet(str(root) + "/pairs/batch_*")
        return {tuple(r) for r in out.collect()}, w

    all_at_once, _ = run(tmp_path / "r1", [[1, 2, 3, 4, 5]])
    split, w2 = run(tmp_path / "r2", [[3, 1], [5, 4], [2]])
    reversed_split, _ = run(tmp_path / "r3", [[2], [5, 4], [3, 1]])
    assert all_at_once == split == reversed_split
    ids = {(a, b) for a, b, _ in all_at_once}
    assert ids == {(1, 2), (1, 4), (2, 4)}

    # replay batch 1 on the live worker and through a fresh instance
    w2.process(df.where(F.col("doc_id").isin([5, 4])), 1)
    again = spark.read.parquet(str(tmp_path / "r2") + "/pairs/batch_*")
    assert {tuple(r) for r in again.collect()} == split
    w3 = IncrementalDedupIndex(str(tmp_path / "r2"))
    w3.process(df.where(F.col("doc_id").isin([5, 4])), 1)
    again2 = spark.read.parquet(str(tmp_path / "r2") + "/pairs/batch_*")
    assert {tuple(r) for r in again2.collect()} == split


def test_stream_dedup_postings_layout_mismatch_refuses(spark, tmp_path):
    """Postings files written under an older bucket layout must never be
    re-registered under today's DDL (the bucketed scan would assume a
    hash distribution the files don't have and the exchange-free join
    would silently drop matches): a fingerprint mismatch refuses loudly
    instead of rebuilding — streaming state is history the worker must
    not wipe."""
    import pytest

    from fintech_data_lake_as_code_spark.streaming.queries import (
        IncrementalDedupIndex,
        _fs_read_text,
        _fs_write_text,
    )

    docs = spark.createDataFrame(
        [(1, "one document of shared words"), (2, "two document of shared words")],
        "doc_id bigint, text string",
    )
    root = tmp_path / "root"
    w = IncrementalDedupIndex(str(root))
    w.process(docs.where(F.col("doc_id") == 1), 0)
    marker = str(root / "_POSTINGS_LAYOUT")
    assert _fs_read_text(spark, marker).strip().endswith(":h:batch_id")
    # an older code generation wrote the marker through the same FS API
    _fs_write_text(spark, marker, "16:h:batch_id\n")
    # fresh post-restart worker: must refuse, and must not have touched
    # the catalog state or the stored partitions
    w2 = IncrementalDedupIndex(str(root))
    w2.drop_postings_table(spark)  # simulate a lost metastore entry
    with pytest.raises(RuntimeError, match="layout"):
        w2.process(docs.where(F.col("doc_id") == 2), 1)


def test_stream_dedup_postings_empty_marker_treated_as_absent(spark, tmp_path):
    """A zero-length/blank layout marker is a torn write from a crash
    mid-publish, not a recorded layout: the worker must rewrite it and
    proceed instead of refusing with a misleading \"layout ''\" mismatch
    (ADVICE r12; _fs_write_text now publishes via temp+rename so new
    markers can't tear, but pre-fix empty files may exist on disk)."""
    from fintech_data_lake_as_code_spark.streaming.queries import (
        IncrementalDedupIndex,
        _fs_read_text,
    )

    docs = spark.createDataFrame(
        [(1, "one document of shared words"), (2, "two document of shared words")],
        "doc_id bigint, text string",
    )
    root = tmp_path / "root"
    w = IncrementalDedupIndex(str(root))
    w.process(docs.where(F.col("doc_id") == 1), 0)
    marker = root / "_POSTINGS_LAYOUT"
    fingerprint = _fs_read_text(spark, str(marker)).strip()
    marker.write_text("")  # torn pre-atomic write
    w2 = IncrementalDedupIndex(str(root))
    w2.process(docs.where(F.col("doc_id") == 2), 1)  # must not raise
    assert _fs_read_text(spark, str(marker)).strip() == fingerprint


def test_scd2_batch0_double_delivery_collapses_to_one_version(spark, tmp_path):
    """At-least-once double delivery WITHIN the first micro-batch: the
    batch-0 branch must dedupe event_id like the merge branch does, or
    the duplicated event emits two version rows (one zero-length
    interval). r15 latent-backlog pin."""
    import datetime as dt

    from fintech_data_lake_as_code_spark.streaming.queries import (
        Scd2Merger,
        _scd2_rows,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    schema = (
        "event_id bigint, user_id bigint, event_type string, "
        "value double, ts timestamp"
    )
    dup = (1, 7, "signup", 1.0, t0)
    b0 = spark.createDataFrame(
        [dup, dup, (3, 7, "click", 3.0, t0 + 2 * m)], schema
    )
    mg = Scd2Merger(str(tmp_path / "scd2_dup"))
    mg.merge(b0, 0)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(mg.latest_dir())
        .select("user_id", "event_id", "valid_from_epoch",
                "valid_to_epoch", "is_current")
        .collect()
    )
    truth = sorted(
        tuple(r)
        for r in _scd2_rows(
            spark.createDataFrame([dup, (3, 7, "click", 3.0, t0 + 2 * m)],
                                  schema)
        )
        .select("user_id", "event_id", "valid_from_epoch",
                "valid_to_epoch", "is_current")
        .collect()
    )
    assert got == truth
    assert len(got) == 2  # one version row per unique event


def test_watermark_late_source_is_pid_keyed_and_sweeps_dead_owners(
    spark, sf_dir
):
    """The PID-keyed landing (ADVICE r14): a dir owned by a DEAD process
    is reclaimed, a dir owned by a LIVE foreign process is untouchable,
    and non-pid entries are ignored — so concurrent sessions can never
    rmtree the dir a peer's running file-stream source is polling."""
    import os
    import subprocess

    from fintech_data_lake_as_code_spark.io import scratch_dir
    from fintech_data_lake_as_code_spark.registry import registry as reg

    base = scratch_dir(sf_dir, "stream_late")
    p = subprocess.Popen(["true"])
    p.wait()
    dead_dir = os.path.join(base, f"pid{p.pid}")
    live_dir = os.path.join(base, "pid1")  # PID 1 always exists
    other = os.path.join(base, "not_a_pid")
    for d in (dead_dir, live_dir, other):
        os.makedirs(d, exist_ok=True)
    try:
        df = reg()["stream_watermark_late"].fn(spark, sf_dir)
        assert df.count() > 0
        assert not os.path.exists(dead_dir), "dead owner's dir not swept"
        assert os.path.exists(live_dir), "live peer's dir must survive"
        assert os.path.exists(other), "non-pid entries are not ours to sweep"
        assert os.path.isdir(os.path.join(base, f"pid{os.getpid()}"))
    finally:
        import shutil

        shutil.rmtree(live_dir, ignore_errors=True)
        shutil.rmtree(other, ignore_errors=True)
