"""Similarity search over embeddings (north-star LLM-pipeline set).

Two paths:
- `sim_topk_cosine`: brute-force top-k cosine — the correctness baseline.
  Query set x full candidate set via a broadcast of the (small) query side,
  dot products in double, per-query window top-k. Full DuckDB oracle.
- `sim_topk_lsh`: the 100 TB path — random-hyperplane LSH (deterministic
  LCG-derived hyperplanes) buckets candidates; only same-bucket pairs are
  scored. Recall against the brute-force baseline is asserted in
  tests/test_llm_ops.py.

Scale notes: brute force is O(|Q| x N) — fine only because |Q| is fixed and
broadcast; the LSH path replaces the candidate set with an equality join on
bucket id, which is the only shape that survives when N is billions of
vectors. Ranking uses round(cos, 6) with a vec_id tiebreak so ordering is
stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import query

N_QUERIES = 10
TOP_K = 5
N_PLANES = 8
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@query(
    "sim_topk_cosine",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), queries AS (
      SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, c.vec_id,
             list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)))
               AS cos
      FROM queries q JOIN vecs c ON q.query_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY round(cos, 6) DESC, vec_id) AS rnk
      FROM scored
    )
    SELECT query_id, rnk, vec_id, round(cos, 4) AS cos_sim
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k cosine: the first {N_QUERIES} vectors are queries;
    candidates are all other vectors. Broadcast the query side (tiny), score
    JVM-side via zip_with/aggregate, rank per query."""
    # norms are per-VECTOR, so compute them once per row before the join —
    # not per (query, candidate) pair inside it (3x less higher-order-fn
    # work; float-identical because the expression shape is unchanged)
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    vecs = vecs.withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v"))))
    queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = (
        vecs.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cos", 6).desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def _lsh_bucket(v: Column) -> Column:
    """Sign-bit bucket from N_PLANES deterministic pseudo-random hyperplanes.
    Hyperplane p component d = (lcg2(p*1000+d) % 2001 - 1000) / 1000, the
    same portable LCG the datagen uses — reproducible anywhere, no
    stored model."""

    def plane_dot(p: int) -> Column:
        def comp(x, i):
            # cast before multiplying: sequence indices are 32-bit INTs and
            # the LCG multiplier overflows them under ANSI arithmetic
            s = (F.lit(p) * 1000 + i).cast("bigint") * LCG_A + LCG_C
            s = s % LCG_M
            s = (s * LCG_A + LCG_C) % LCG_M
            return x * ((s % 2001 - 1000).cast("double") / 1000.0)

        pairs = F.zip_with(
            v, F.sequence(F.lit(0), F.size(v) - 1), lambda x, i: comp(x, i)
        )
        return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.lit(0)
    for p in range(N_PLANES):
        bucket = bucket + F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


@query("sim_topk_lsh")  # rows-only: recall vs brute force asserted in pytest
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: bucket = 8 sign bits; queries
    only score candidates in their own bucket — the equality-join shape
    that scales to billions of vectors (multi-probe/repetition would raise
    recall; one table keeps the demo honest). Deterministic hyperplanes
    from the portable LCG."""
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    bucketed = (
        vecs.withColumn("bucket", _lsh_bucket(F.col("v")))
        .withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v"))))
        .cache()
    )
    queries = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("nv").alias("nq"),
    )
    scored = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cos", 6).desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )


K_CELLS = 16
N_PROBE = 4


@query("sim_topk_ivf")  # rows-only: recall vs brute force asserted in pytest
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index: a k-means coarse
    quantizer partitions the vector space into K_CELLS cells; every
    candidate is assigned to its nearest centroid MAP-SIDE (the centroids
    ride along as a plan literal — no join, no shuffle for assignment), and
    each query probes only its N_PROBE nearest cells. Candidate generation
    is then an equi-join on cell_id — the IVF-flat shape that scales to
    billions of vectors (train the quantizer on a sample, assignment stays
    embarrassingly parallel, probe cost is K/N_PROBE-th of brute force).
    Seeded KMeans => deterministic within an engine; rows-only because
    float reduction order differs across engines."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    train = vecs.select(array_to_vector("v").alias("features"))
    model = KMeans(k=K_CELLS, seed=42, maxIter=10).fit(train)
    # K_CELLS x dim doubles as a literal: tiny, and keeps cell assignment
    # inside whole-stage codegen instead of behind a join
    centroids = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in center])
            for center in model.clusterCenters()
        ]
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = F.transform(centroids, lambda c: l2(F.col("v"), c))
    assigned = vecs.select(
        "vec_id",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nv"),
        (F.array_position(dists, F.array_min(dists)) - 1).alias("cell_id"),
    )
    # queries probe their N_PROBE nearest cells: sort (dist, cell) structs,
    # slice, explode -> one (query, probe_cell) row per probe
    probe_cells = F.slice(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(K_CELLS - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
            )
        ),
        1,
        N_PROBE,
    )
    queries = (
        vecs.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nq"),
            F.explode(probe_cells).alias("probe"),
        )
        .select(
            "query_id",
            "qv",
            "nq",
            F.col("probe.cell").cast("long").alias("cell_id"),
        )
    )
    scored = (
        assigned.join(
            F.broadcast(queries),
            (queries.cell_id == assigned.cell_id)
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cos", 6).desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )
