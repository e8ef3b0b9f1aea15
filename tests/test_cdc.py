"""CDC round-trip test (SURVEY.md §5.3, FIXTURES.md §3): a synthetic DMS
changelog (load + insert/update/delete + at-least-once duplicates) ingested
bronze->silver must materialize exactly the final OLTP state, and quirk
tests from SURVEY §1.4 (datagen enum coercion, decimal cap, determinism)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.operators.cdc import ENVELOPE_SCHEMA
from fintech_data_lake_as_code_spark.sources.datagen import customeractivity


def envelope(txn_id, op, user_id, event_type, value, ts_epoch):
    return json.dumps(
        {
            "data": {
                "user_id": user_id,
                "event_type": event_type,
                "value": value,
                "ts_epoch": ts_epoch,
            },
            "metadata": {
                "operation": op,
                "schema-name": "workshopDb",
                "table-name": "customeractivity",
                "transaction-id": txn_id,
            },
        }
    )


def test_changelog_roundtrip_materializes_final_state(spark):
    raw = [
        # full-load snapshot: users 1..3
        envelope(1, "load", 1, "FUNDTRANSFER", 100.0, 1000),
        envelope(2, "load", 2, "ENQUIRY", 200.0, 1001),
        envelope(3, "load", 3, "FOREX", 300.0, 1002),
        # CDC phase: insert user 4, update user 1 (ts rewritten per
        # setupTables.py:57), delete user 2
        envelope(4, "insert", 4, "MF-INVEST", 400.0, 2000),
        envelope(5, "update", 1, "UPITRANSACTION", 150.0, 2001),
        envelope(6, "delete", 2, "ENQUIRY", 200.0, 2002),
        # at-least-once redelivery of the update (same transaction-id)
        envelope(5, "update", 1, "UPITRANSACTION", 150.0, 2001),
    ]
    bronze = spark.createDataFrame([(s,) for s in raw], "raw string")
    parsed = bronze.select(
        F.from_json("raw", ENVELOPE_SCHEMA).alias("env")
    ).select("env.data.*", "env.metadata.*")

    # dedupe on transaction-id (at-least-once -> exactly-once)
    deduped = parsed.dropDuplicates(["transaction-id"])
    assert deduped.count() == 6

    # latest state per key honoring trailing deletes (A11 semantics)
    latest = F.max_by(
        F.struct("event_type", "value", "operation"),
        F.struct("ts_epoch", F.col("transaction-id")),
    )
    state = (
        deduped.groupBy("user_id")
        .agg(latest.alias("s"))
        .where(F.col("s.operation") != "delete")
        .select("user_id", "s.event_type", "s.value")
    )
    got = {(r.user_id, r.event_type, r.value) for r in state.collect()}
    assert got == {
        (1, "UPITRANSACTION", 150.0),  # update won (rewritten ts)
        (3, "FOREX", 300.0),  # untouched load row
        (4, "MF-INVEST", 400.0),  # inserted
        # user 2 deleted
    }


def test_datagen_mirrors_reference_distributions(spark):
    df = customeractivity(spark, n_rows=1000).cache()
    # ~1/3 of draws are NONMON -> coerced to '' (SURVEY §1.4.1)
    n_invalid = df.where(F.col("transaction_type") == "").count()
    assert 250 < n_invalid < 420
    # domains + ranges (setupTables.py:49-59, updateTables.py:21)
    assert df.where(~F.col("city").rlike("^[A-Z]{3}$")).count() == 0
    bounds = df.agg(
        F.min("monetary_value").alias("lo"),
        F.max("monetary_value").alias("hi"),
        F.min("timeinapp").alias("tlo"),
        F.max("timeinapp").alias("thi"),
    ).first()
    assert 100.0 <= bounds.lo and bounds.hi <= 10000.0
    assert 100 <= bounds.tlo and bounds.thi <= 180
    # decimal(8,2) cap (SURVEY §1.4.2): everything fits, nothing overflows
    assert df.where(F.col("monetary_value") > 999999.99).count() == 0
    # deterministic: regeneration is identical
    again = customeractivity(spark, n_rows=1000)
    assert df.exceptAll(again).count() == 0 and again.exceptAll(df).count() == 0
    df.unpersist()


def test_gdpr_erasure_physically_removes_erased_users(spark, sf_dir):
    # the rewritten lake on disk must contain ZERO rows for erased users
    # (reading the manifest is not enough — erasure must be physical)
    from pyspark.sql import functions as F

    from fintech_data_lake_as_code_spark.io import pid_scratch_path
    from fintech_data_lake_as_code_spark.registry import registry

    rows = registry()["cdc_gdpr_erasure"].fn(spark, sf_dir).collect()
    assert sum(r.n_rows_erased for r in rows) > 0, "nothing erased — vacuous"
    # pid_scratch_path, not pid_scratch_dir: the dir-returning helper
    # clears on entry, which would wipe the lake this test inspects
    out = pid_scratch_path(sf_dir, "cdc_gdpr_erasure")
    leaked = (
        spark.read.parquet(out)
        .where(F.col("user_id") % 10 == 7)
        .count()
    )
    assert leaked == 0, f"{leaked} rows of erased users survived the rewrite"


def test_gdpr_null_event_type_merge(spark, tmp_path):
    # NULL is a legal GROUP BY group: the kept-counts and tombstone sides
    # must merge their NULL rows into ONE manifest row (eqNullSafe join) —
    # a plain `=` outer join would emit two half-null rows instead.
    import datetime

    from fintech_data_lake_as_code_spark.registry import registry

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 7, None, ts),  # erased (user_id % 10 == 7), null type
        (2, 7, None, ts),
        (3, 1, None, ts),  # kept, null type
        (4, 17, "click", ts),  # erased, typed
        (5, 2, "click", ts),  # kept, typed
        (6, 2, "click", ts),
        (7, 2, "click", ts),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r.event_type: (r.n_rows_kept, r.n_rows_erased, r.n_users_erased)
        for r in registry()["cdc_gdpr_erasure"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {None: (1, 2, 1), "click": (3, 1, 1)}, got


def test_scd2_pointintime_subsecond_ts_beats_event_id_order(spark):
    # ADVICE r8: two dim versions land in the SAME second with event_id
    # order OPPOSITE to sub-second ts order; a later fact must take the
    # version that is live under the oracle's full-precision LEAD(ts)
    # interval construction — the one with the LARGER ts, regardless of
    # event_id. A fact inside that same second must also match it (dim
    # rows of a second sort before that second's facts).
    import datetime as dt

    from fintech_data_lake_as_code_spark.operators.joins import (
        scd2_pointintime,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    us = lambda micros: base + dt.timedelta(microseconds=micros)  # noqa: E731
    ev = spark.createDataFrame(
        [
            # event_id 99 but EARLIER sub-second ts; event_id 1 later ts
            (99, 7, "profile", 1.00, us(100_000)),
            (1, 7, "profile", 2.00, us(900_000)),
            # fact in the same second, between the two dim rows
            (50, 7, "purchase", 0.0, us(500_000)),
            # fact in a later second
            (60, 7, "purchase", 0.0, base + dt.timedelta(seconds=5)),
        ],
        "event_id bigint, user_id bigint, event_type string,"
        " value double, ts timestamp",
    )
    got = {r.event_id: r for r in scd2_pointintime(ev).collect()}
    # both facts see the ts=.9 version (cents=200): it is the last dim
    # version of its second under full-precision ordering
    assert got[50].profile_cents == 200, got[50]
    assert got[60].profile_cents == 200, got[60]


def test_incremental_agg_null_type_group_and_retraction(spark):
    # round-8 review findings: (1) the base+delta merge must be
    # NULL-SAFE on the group key — a plain equi-join splits the
    # NULL-type group into two half-rows; (2) "user existed in
    # snapshot" must use a dedicated marker — keying existence off the
    # nullable old event_type skips retracting a NULL-type snapshot row
    import datetime as dt
    import json

    from fintech_data_lake_as_code_spark.operators.cdc import incremental_agg

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)

    def row(eid, uid, etype, value, op, sec):
        return (
            eid, t0 + dt.timedelta(seconds=sec), uid, etype, value,
            json.dumps({"k": op}),
        )

    # ops via props.k: _operation maps k%3 -> insert/replace/delete-ish;
    # use explicit k values 0,1,2 and read back what they mean from the
    # oracle-free invariant below instead of assuming the mapping
    ev = spark.createDataFrame(
        [
            # snapshot (even event_id): user 1 latest row has NULL type
            row(2, 1, None, 10.0, 0, 0),
            # user 2 snapshot row, normal type
            row(4, 2, "view", 20.0, 0, 1),
            # batch (odd event_id): user 1 replaced by a 'click' row —
            # the NULL-type snapshot contribution MUST be retracted
            row(5, 1, "click", 30.0, 1, 10),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: (r.n_users, r.value_cents) for r in incremental_agg(ev).collect()}
    # expected current state: user1 -> click 30.00, user2 -> view 20.00;
    # the NULL-type group must be gone (retracted), never half-counted
    assert None not in got, got
    assert got.get("view") == (1, 2000), got
    assert got.get("click") == (1, 3000), got


def test_scd2_pointintime_null_attribute_does_not_tear_versions(spark):
    # a NULL attribute on the newest dim version must ride through: the
    # whole last version wins, never a mix of fields from two versions
    # (independent last(ignorenulls) per column would fetch the older
    # version's non-null cents — round-8 review finding)
    import datetime as dt

    from fintech_data_lake_as_code_spark.operators.joins import (
        scd2_pointintime,
    )

    t0 = dt.datetime(2024, 2, 1, 9, 0, 0)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, 7, "profile", 1.00, sec(0)),    # v1: cents 100
            (2, 7, "profile", None, sec(10)),   # v2: cents NULL (newest)
            (3, 7, "purchase", 0.0, sec(20)),   # fact after v2
        ],
        "event_id bigint, user_id bigint, event_type string,"
        " value double, ts timestamp",
    )
    rows = {r.event_id: r for r in scd2_pointintime(ev).collect()}
    r = rows[3]
    assert r.profile_type == "profile"
    assert r.profile_cents is None, (
        "NULL cents of the newest version must not tear back to v1's 100"
    )
    import calendar

    assert r.valid_from == calendar.timegm(sec(10).timetuple())


def test_wap_verdict_flip_clears_the_stale_sibling_dir(spark, sf_dir):
    """Write-audit-publish governance: when a rule's verdict flips
    between runs, the OPPOSITE verdict's directory from the prior run
    must not survive looking committed — a reader listing published
    dirs would see a batch the current audit quarantined (r15
    latent-backlog pin). Simulated by planting a fake committed sibling
    before the run. Since r16 the wap_* dirs are PID-keyed
    (io.pid_scratch_dir — ADVICE r15 closed the cross-process clear
    race), so the stale sibling a flip must clear is THIS process's own
    pid dir; that is where the markers are planted."""
    import os

    from fintech_data_lake_as_code_spark.io import scratch_dir
    from fintech_data_lake_as_code_spark.registry import registry as reg

    # value_positive passes on the fixture -> publishes; plant a stale
    # quarantine sibling. value_cap_300 fails -> quarantines; plant a
    # stale published sibling.
    pid = f"pid{os.getpid()}"
    stale_q = os.path.join(
        scratch_dir(sf_dir, "wap_quarantine_value_positive"), pid
    )
    stale_p = os.path.join(
        scratch_dir(sf_dir, "wap_published_value_cap_300"), pid
    )
    for d in (stale_q, stale_p):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "stale.marker"), "w") as fh:
            fh.write("left by a prior flipped-verdict run\n")

    rows = {r.rule: r for r in
            reg()["sink_write_audit_publish"].fn(spark, sf_dir).collect()}
    assert rows["value_positive"].published
    assert not rows["value_cap_300"].published
    assert not os.path.exists(stale_q), "stale quarantine sibling survived"
    assert not os.path.exists(stale_p), "stale published sibling survived"
