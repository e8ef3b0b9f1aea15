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
    # the two remaining banded/blocked dedup strategies — prefix-filter
    # (PPJoin) and band-blocked simhash are exactly where an accidental
    # all-pairs regression would hide
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_topk_lsh",
    # r7 heavies (VERDICT r7 ask #4): the trained-quantizer ANN path
    # (bounded train + cell equi-join => linear in corpus at fixed
    # query count) and the degree-oriented triangle count (10 disjoint
    # replica graphs => exactly 10x edges/wedges/triangles)
    "sim_topk_ivf_kmeans",
    "graph_triangle_count",
    # gopher repetition is a map-side gram explode — linear in tokens.
    # (sim_maxsim_multivector is deliberately NOT here: its registered
    # form scores ALL label pairs — quadratic in label count by design.
    # The ANN swap that closes it, `sim_maxsim_ann`, IS under the gate
    # via its own dedicated test below — parameterized like SemDeDup's,
    # because its linearity contract requires the bucket space to grow
    # with the corpus and a non-near-dup replica fixture.)
    "text_repetition_gopher",
    "text_decontaminate",
    # r10: the streaming twin of dedup_incremental — four micro-batches,
    # each probing the accumulated shingle-index generations through the
    # same PPJoin core. 10x corpus => 10x per-batch docs over the same
    # batch count, so a healthy run grows ~linearly; an all-pairs
    # regression in the per-batch probe (or an index side that starts
    # re-shingling history) shows up as the quadratic signature.
    "stream_dedup_incremental",
    # r8: the cut-point-binned RFM rework reads the replicated events
    # (10x users, same per-user event density) — guards the
    # distributed-rank path against any single-funnel regression
    "win_rfm_score",
]


@pytest.fixture(scope="module")
def big_dir(spark) -> str:
    out = os.path.join(SCRATCH_ROOT, "sf_stress")
    # v2: adds replicated events + lineitem and per-replica labels on
    # embeddings (labels must scale with the corpus or label-blocked
    # truth sets densify quadratically — same reason the replica corpus
    # tags words)
    marker = os.path.join(out, "_BUILT_v2")
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
                F.concat_ws("_", "label", "rep").alias("label"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "embeddings.parquet"))
        )
        ev = load(spark, BASE_SF_DIR, "events")
        (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") * N_REPLICAS + F.col("rep")).alias(
                    "event_id"
                ),
                (F.col("user_id") * N_REPLICAS + F.col("rep")).alias(
                    "user_id"
                ),
                "event_type",
                "value",
                "ts",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "events.parquet"))
        )
        li = load(spark, BASE_SF_DIR, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        (
            li.crossJoin(reps)
            .select(
                (F.col("l_orderkey") * N_REPLICAS + F.col("rep")).alias(
                    "l_orderkey"
                ),
                (F.col("l_suppkey") * N_REPLICAS + F.col("rep")).alias(
                    "l_suppkey"
                ),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "lineitem.parquet"))
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


def test_spatial_grid_scales_with_area(spark):
    # the spatial join's scale regime is FIXED radius over a GROWING
    # world: 10x points spread over ~10x cells (constant density), so
    # candidates and output grow ~10x — linear. (Scaling points inside
    # a fixed area instead grows the TRUE pair set quadratically; that
    # measures the answer's size, not the plan.) All-pairs regression
    # signature: candidate count independent of the grid => ~100x.
    from fintech_data_lake_as_code_spark.operators.joins import (
        spatial_grid_join,
    )

    def pts(n, mx, my):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("user_id"),
                (F.col("id") % mx).alias("x"),
                ((F.col("id") * 7) % my).alias("y"),
            )
            .distinct()
        )

    base_pts = pts(1500, 37, 41)
    big_pts = pts(15000, 127, 131)

    def run(p):
        t0 = time.perf_counter()
        spatial_grid_join(p).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run(base_pts), run(big_pts)  # warm
    t_base, t_big = run(base_pts), run(big_pts)
    ratio = t_big / max(t_base, 1e-3)
    assert ratio < MAX_RATIO, (
        f"spatial grid: 10x points / 10x area cost {ratio:.1f}x "
        f"({t_base:.2f}s -> {t_big:.2f}s)"
    )


@pytest.fixture(scope="module")
def maxsim_big_dir(spark) -> str:
    """10x embeddings corpus for the MaxSim-ANN scale law, built with
    per-replica deterministic SIGN FLIPS instead of jitter: flipping the
    same dimensions on both sides of a pair preserves every
    within-replica cosine exactly (per-replica candidate structure and
    MaxSim scores are identical to base), while cross-replica vectors
    decorrelate to near-orthogonal — modeling a corpus that grew with
    NEW content. The shared big_dir's jittered replicas would instead
    keep all 10 twins of every label true near-dups of each other, so
    the TRUE label-pair neighbor graph itself would densify
    quadratically — measuring the answer's size, not the plan (the
    spatial-grid note above). Labels shift by 10*rep, which preserves
    the even/odd query/doc parity split."""
    out = os.path.join(SCRATCH_ROOT, "sf_stress_maxsim")
    marker = os.path.join(out, "_BUILT_v1")
    if not os.path.exists(marker):
        reps = spark.range(N_REPLICAS).select(F.col("id").alias("rep"))
        emb = load(spark, BASE_SF_DIR, "embeddings")
        (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") * N_REPLICAS + F.col("rep")).alias(
                    "vec_id"
                ),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        * (
                            1
                            - 2
                            * F.pmod(
                                F.xxhash64(F.col("rep") * 1024 + i), 2
                            )
                        ).cast("float")
                    ),
                ).alias("embedding"),
                (F.col("label") + 10 * F.col("rep")).alias("label"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "embeddings.parquet"))
        )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


def test_maxsim_ann_scales_with_planes(spark, maxsim_big_dir):
    # MaxSim-ANN's linearity contract (the swap closing the last
    # documented quadratic, VERDICT r8 #5): the LSH bucket space grows
    # with the corpus so collision-join fan-out stays bounded (10x
    # corpus -> +3 sign bits = 8x buckets, the FAISS nlist practice),
    # and the top-C cap bounds the rerank at C doc labels per query
    # regardless of how many labels exist. A fixed-plane run on the 10x
    # corpus WOULD be ~100x collision rows — that is the regression
    # this guards (candidate generation degrading to all-pairs under
    # growing occupancy). Only the operational ANN path runs here; the
    # registered contract key's exact verification pass is all-pairs by
    # definition and stays out, like SemDeDup's truth set.
    from fintech_data_lake_as_code_spark.operators.similarity import (
        N_PLANES,
        _dvec,
        maxsim_ann_scores,
    )

    def run(sf, n_planes):
        vecs = load(spark, sf, "embeddings").select(
            "vec_id", "label", _dvec("embedding").alias("x")
        )
        t0 = time.perf_counter()
        maxsim_ann_scores(
            vecs, F.col("label") % 2 == 0, n_planes=n_planes
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run(BASE_SF_DIR, N_PLANES), run(maxsim_big_dir, N_PLANES + 3)  # warm
    t_base = run(BASE_SF_DIR, N_PLANES)
    t_big = run(maxsim_big_dir, N_PLANES + 3)
    ratio = t_big / max(t_base, 1e-3)
    assert ratio < MAX_RATIO, (
        f"maxsim ann: {N_REPLICAS}x corpus at 8x buckets cost "
        f"{ratio:.1f}x wall time ({t_base:.2f}s -> {t_big:.2f}s) — "
        "quadratic-shaped blowup"
    )


def test_semantic_cluster_scales_with_k(spark, big_dir):
    # SemDeDup's linearity contract: k grows with the corpus so cell
    # occupancy stays bounded (sum of squared cluster sizes ~ n, not
    # n^2). 10x corpus at 10x k must stay far from the quadratic
    # signature; a fixed-k run on the 10x corpus WOULD be ~100x — that
    # is the regression this guards (candidate generation degrading to
    # within-cell all-pairs at unbounded occupancy).
    from fintech_data_lake_as_code_spark.operators.dedup import (
        SEMDEDUP_K,
        semantic_cluster_pairs,
    )

    def run(sf, k):
        t0 = time.perf_counter()
        semantic_cluster_pairs(spark, sf, k=k).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    run(BASE_SF_DIR, SEMDEDUP_K), run(big_dir, SEMDEDUP_K * N_REPLICAS)
    t_base = run(BASE_SF_DIR, SEMDEDUP_K)
    t_big = run(big_dir, SEMDEDUP_K * N_REPLICAS)
    ratio = t_big / max(t_base, 1e-3)
    assert ratio < MAX_RATIO, (
        f"semantic cluster: 10x corpus at 10x k cost {ratio:.1f}x "
        f"({t_base:.2f}s -> {t_big:.2f}s)"
    )
