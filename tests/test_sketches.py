"""Sketch/approximate-operator guarantees: estimates must stay within
their published error bounds against exact answers on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import load
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
    # default lgConfigK=12 => relative standard error ~1.6%; 5% is 3 sigma
    assert abs(total[0].est_users - exact_total) / exact_total < 0.05
    for r in per_type:
        assert abs(r.est_users - r.exact_users) / max(r.exact_users, 1) < 0.05, r


def test_cms_never_underestimates_and_stays_tight(spark, sf_dir):
    rows = SPECS["agg_sketch_cms"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    total = None
    for r in rows:
        # count-min is one-sided: estimate >= true count, always
        assert r.est_count >= r.exact_count, r
        # eps=0.001 bounds overestimate by ~0.1% of total stream length;
        # allow 1% slack for the tiny per-day sketches
        assert r.est_count <= r.exact_count * 1.01 + 50, r
