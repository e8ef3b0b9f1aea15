"""Scale-law stress smoke (run with `-m slow`; excluded from the default
suite via pyproject addopts).

The heavy dedup/ANN family is designed around bucketed candidate
generation precisely so cost grows ~linearly in corpus size. These tests
are the cheapest way to catch an accidental O(n^2) (a candidate generator
silently degrading to all-pairs) BEFORE a full-scale bench would: build a
10x corpus from the sf0.1 tables, run each heavy query at both scales,
and assert the wall-time ratio stays far below the quadratic signature
(10x data -> ~100x time). Threshold 40x: generous against sandbox noise
and super-linear shuffle constants, an order of magnitude below
quadratic.

The 10x corpus preserves DUPLICATE DENSITY, which is what drives these
queries' cost: each of the 10 replicas tags every word with its replica
id, so documents that were near-dups of each other stay near-dups within
a replica while no cross-replica pair shares a single shingle — the
candidate-pair count scales exactly 10x, like a corpus that actually
grew. (Plain replication would instead make every doc a 10-way exact dup
and measure a different, denser problem.) Embeddings get per-replica
deterministic jitter for the same reason.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.io import SCRATCH_ROOT, load
from fintech_data_lake_as_code_spark.registry import registry

pytestmark = pytest.mark.slow

BASE_SF_DIR = "/root/testdata/sf0.1"
N_REPLICAS = 10
MAX_RATIO = 40.0  # quadratic would be ~100x; healthy linear-ish is ~10-20x

HEAVY_KEYS = [
    "dedup_near_minhash",
    "dedup_incremental",
    "dedup_cluster_cc",
    "dedup_containment",
    "dedup_paragraph",
    "sim_topk_lsh",
    "text_decontaminate",
]


@pytest.fixture(scope="module")
def big_dir(spark) -> str:
    out = os.path.join(SCRATCH_ROOT, "sf_stress")
    marker = os.path.join(out, "_BUILT")
    if not os.path.exists(marker):
        reps = spark.range(N_REPLICAS).select(F.col("id").alias("rep"))
        docs = load(spark, BASE_SF_DIR, "documents")
        (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") * N_REPLICAS + F.col("rep")).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat_ws("_", w, F.col("rep")),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "documents.parquet"))
        )
        emb = load(spark, BASE_SF_DIR, "embeddings")
        (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") * N_REPLICAS + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x + (F.col("rep") * (i + 1) % 97).cast("float") / 1e4
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "embeddings.parquet"))
        )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


@pytest.mark.parametrize("key", HEAVY_KEYS)
def test_heavy_query_scales_sub_quadratically(spark, big_dir, key):
    fn = registry()[key].fn
    # warm both corpora's shared artifacts (shingle index, LSH tables)
    # once so the ratio compares steady-state compute, not cache builds
    _timed(fn, spark, BASE_SF_DIR)
    _timed(fn, spark, big_dir)
    t_base = _timed(fn, spark, BASE_SF_DIR)
    t_big = _timed(fn, spark, big_dir)
    ratio = t_big / max(t_base, 1e-3)
    assert ratio < MAX_RATIO, (
        f"{key}: {N_REPLICAS}x corpus cost {ratio:.1f}x wall time "
        f"({t_base:.2f}s -> {t_big:.2f}s) — quadratic-shaped blowup"
    )
