"""Sketch/approximate-operator guarantees: estimates must stay within
their published error bounds against exact answers on the same data.

The graded queries emit the engine-portable contract (exact value +
`within_bound` boolean); these tests additionally pin the RAW estimate
quality — the tight bounds the boolean summarizes — by querying the
sketch machinery directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import load
from fintech_data_lake_as_code_spark.operators.aggregates import merged_cms_sketch
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
    # one-sided guarantee directly (est >= exact, est <= exact + ~eps*N)
    ev = load(spark, sf_dir, "events")
    merged, n_total = merged_cms_sketch(spark, ev)
    jvm = spark.sparkContext._jvm
    for r in rows:
        est = merged.estimateCount(jvm.java.lang.Long(r.user_id))
        # count-min is one-sided: estimate >= true count, always
        assert est >= r.exact_count, r
        # eps=0.001 bounds overestimate by ~0.1% of total stream length;
        # allow 1% slack for the tiny per-day sketches
        assert est <= r.exact_count * 1.01 + 0.001 * n_total + 50, r
