"""Graph analytics over relational data (SURVEY.md §2 extension).

The lake's relations imply graphs — near-dup pairs (dedup_cluster_cc's
connected components), and here the customer–supplier TRADING graph:
an edge wherever a customer's order contains a supplier's lineitem.
`graph_pagerank` ranks nodes by stationary importance on that graph.

Design for iterative algorithms on Spark (same playbook as the CC loop):
the edge relation is built ONCE and cached; each iteration is one
equi-join + one reassociative groupBy (a single shuffle on the same key);
`localCheckpoint` severs lineage so the plan does not grow with the
iteration count. A FIXED iteration count (no convergence probe) keeps the
result a pure function of the input.

Engine parity for an iterative FLOAT algorithm is hopeless (reduction
order differs per engine/partitioning), so the ranks are computed in
SCALED INTEGER arithmetic end to end: rank`div`deg contributions and
the (850 * sum)`div`1000 damping are Spark's integral `div` on BIGINT
operands — never a double quotient, so values past 2^53 cannot drift
off-by-one the way `floor(a / b)` can. All operands here are positive,
where Spark's truncating `div` and DuckDB's flooring `//` agree exactly
(pinned by tests/test_plans.py::test_bigint_div_exact_past_2_53) — the
DuckDB oracle unrolls the same ten iterations as chained CTEs and must
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

PR_ITERS = 10
PR_SCALE = 1_000_000  # rank fixed-point scale
PR_TOP = 100


def _pr_oracle() -> str:
    base = f"""
    WITH raw AS (
      SELECT DISTINCT o.o_custkey * 2 AS cust_node,
             l.l_suppkey * 2 + 1 AS supp_node
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT cust_node AS src, supp_node AS dst FROM raw
      UNION ALL
      SELECT supp_node, cust_node FROM raw
    ), deg AS (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), edges_deg AS (
      SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src
    ), pr0 AS (
      SELECT src AS node, {PR_SCALE}::BIGINT AS rank FROM deg
    )"""
    iters = "".join(
        f""", pr{i + 1} AS (
      SELECT e.dst AS node,
             150000 + (850 * SUM(p.rank // e.deg)) // 1000 AS rank
      FROM pr{i} p JOIN edges_deg e ON p.node = e.src
      GROUP BY e.dst
    )"""
        for i in range(PR_ITERS)
    )
    return (
        base
        + iters
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS entity_id,
           CAST(rank AS BIGINT) AS rank_scaled
    FROM pr{PR_ITERS}
    ORDER BY rank DESC, node
    LIMIT {PR_TOP}
    """
    )


@query("graph_pagerank", oracle=_pr_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer–supplier trading graph
    (edge = this customer's order contained this supplier's item),
    symmetrized; top-{PR_TOP} most central entities after {PR_ITERS}
    fixed iterations with 0.85 damping.

    Scale shape: edges build from ONE distinct-projected join and stay
    cached; every iteration is join-on-src + groupBy(dst) — the same
    shuffle key, so co-partitioning persists across iterations; eager
    localCheckpoint severs lineage each round (1 job/round, plan size
    constant). At 100 TB the edge list is the big relation and this
    per-iteration cost is exactly one narrow shuffle of (dst, contrib)
    pairs — the textbook distributed PageRank. Integer fixed-point
    arithmetic (see module docstring) makes ten float-free iterations
    bit-identical across engines; top-{PR_TOP} output is rank-desc with
    node-id tiebreak."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    raw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = (
        raw.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
        .unionByName(
            raw.select(
                F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
            )
        )
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges.join(deg, "src").select("src", "dst", "deg").cache()
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("rank"),
    ).localCheckpoint(eager=True)
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                "dst",
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(150000).cast("bigint") + F.expr("(850 * s) div 1000")).alias(
                "rank"
            ),
        ).localCheckpoint(eager=True)
    edges_deg.unpersist()
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(PR_TOP)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("entity_id"),
            F.col("rank").cast("bigint").alias("rank_scaled"),
        )
    )
