"""Sketch/approximate-operator guarantees: estimates must stay within
their published error bounds against exact answers on the same data.

The graded queries emit the engine-portable contract (exact value +
`within_bound` boolean); these tests additionally pin the RAW estimate
quality — the tight bounds the boolean summarizes — by querying the
sketch machinery directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import load
from fintech_data_lake_as_code_spark.operators.aggregates import (
    cms_estimate,
    day_user_counts,
    merged_cms_sketch,
)
from fintech_data_lake_as_code_spark.registry import registry

SPECS = registry()


def test_hll_sketch_within_error_bound(spark, sf_dir):
    rows = SPECS["agg_sketch_hll"].fn(spark, sf_dir).collect()
    exact_total = (
        load(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("c"))
        .first()
        .c
    )
    per_type = [r for r in rows if r.event_type != "__all__"]
    total = [r for r in rows if r.event_type == "__all__"]
    assert len(total) == 1 and len(per_type) >= 1
    # the __all__ row's exact count is the true global distinct
    assert total[0].exact_users == exact_total
    # default lgConfigK=12 => relative standard error ~1.6%; the bound the
    # boolean encodes is 5% (~3 sigma) — every row must honor it
    assert all(r.within_bound for r in rows), rows


def test_cms_never_underestimates_and_stays_tight(spark, sf_dir):
    rows = SPECS["agg_sketch_cms"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.within_bound for r in rows), rows
    # raw-estimate tightness: rebuild the merged sketch and check the
    # one-sided guarantee directly for EVERY user, not just the probe set
    # (est >= exact, est <= exact + ~eps*N)
    from pyspark.sql import functions as F

    day_user = day_user_counts(spark, sf_dir)
    merged, n_total = merged_cms_sketch(spark, day_user)
    exact = (
        day_user.groupBy("user_id")
        .agg(F.sum("cnt").alias("exact_count"))
        .collect()
    )
    assert n_total == sum(r.exact_count for r in exact)
    for r in exact:
        est = cms_estimate(merged, r.user_id)
        # count-min is one-sided: estimate >= true count, always
        assert est >= r.exact_count, r
        # eps = e/w ~= 0.1% of total stream length bounds the overestimate
        assert est <= r.exact_count + 0.0011 * n_total + 1, (r, est)


def test_cms_builds_from_a_single_events_scan(spark, sf_dir):
    # the single-scan claim: once the reduced (day, user, cnt) relation is
    # cached and materialized (the sketch-build action does this inside
    # the query), the probe-set re-aggregation must read the CACHE — no
    # second parquet scan of events
    day_user = day_user_counts(spark, sf_dir).cache()
    try:
        day_user.count()  # stands in for the sketch-build action
        from pyspark.sql import functions as F

        top = day_user.groupBy("user_id").agg(F.sum("cnt").alias("exact_count"))
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan
        # the InMemoryRelation node prints the plan it CACHED (which names
        # the parquet); what must not exist is a FileScan above/outside it
        executed_prefix = plan.split("InMemoryRelation")[0]
        assert "FileScan" not in executed_prefix, plan
    finally:
        day_user.unpersist()
