"""Sort / limit / top-k / set operators (SURVEY.md §2.C).

Reference parity: A16 limit (first 1,000 account ids, updateTables.py:56),
A12 row append as UNION ALL (updateTables.py:20-22), B9 top-k ranking
(setupTables.py:43).

Scale notes: global top-k uses TakeOrderedAndProject (per-partition heap +
driver merge of k rows — no global sort); per-group top-k is a window over
the group key. Multi-key sort-limit is the only query that pays a sort, and
only of the surviving k rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (asc nulls last / desc) with limit — content is
    order-dependent so the sort is observable under a sorted-hash compare."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .limit(100)
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (ref A16 limit + B9 largest investors) — compiles to
    TakeOrderedAndProject, never a full sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, rank_in_seg, o_orderkey, total_price FROM (
      SELECT c.c_mktsegment,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey)
               AS rank_in_seg,
             o.o_orderkey,
             ROUND(o.o_totalprice, 2) AS total_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rank_in_seg <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment — window rank, single shuffle on the
    group key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rank_in_seg", F.row_number().over(w))
        .where(F.col("rank_in_seg") <= 3)
        .select(
            "c_mktsegment",
            "rank_in_seg",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@query(
    "set_union_all",
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows FROM (
      SELECT event_type, user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_type, user_id FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT event_type, user_id FROM events WHERE value > 45
    ) GROUP BY event_type
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / by-name union (ref A12 append path,
    updateTables.py:20-22)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_type", "user_id")
    # deliberately swapped column order to exercise unionByName
    views = ev.where(F.col("event_type") == "view").select("user_id", "event_type")
    big = ev.where(F.col("value") > 45).select("event_type", "user_id")
    return (
        clicks.unionByName(views)
        .unionByName(big)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "set_distinct_ops",
    oracle="""
    SELECT tag, COUNT(*) AS n_users FROM (
      SELECT 'bigbuy_and_bigerror' AS tag, user_id FROM (
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value > 90
        INTERSECT
        SELECT user_id FROM events
        WHERE event_type = 'error' AND value > 90
      )
      UNION ALL
      SELECT 'bigbuy_not_bigerror' AS tag, user_id FROM (
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value > 90
        EXCEPT
        SELECT user_id FROM events
        WHERE event_type = 'error' AND value > 90
      )
      UNION ALL
      SELECT 'distinct_users' AS tag, user_id
      FROM (SELECT DISTINCT user_id FROM events)
    ) GROUP BY tag
    """,
)
def set_distinct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT / INTERSECT / EXCEPT set algebra over user cohorts.

    Cohorts carry a value predicate (purchase > 90 / error > 90)
    because the raw event-type cohorts are DENSE — every user emits
    every event type at every sf, so a type-only EXCEPT branch is
    structurally empty and would certify nothing (the vacuous-predicate
    lesson from filter_pred, r8). Both set branches are populated at
    every generated sf."""
    ev = load(spark, sf_dir, "events")
    big_buyers = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id")
    big_errorers = ev.where(
        (F.col("event_type") == "error") & (F.col("value") > 90)
    ).select("user_id")
    both = big_buyers.intersect(big_errorers).select(
        F.lit("bigbuy_and_bigerror").alias("tag"), "user_id"
    )
    # subtract IS distinct-semantics EXCEPT — no .distinct() needed
    only = big_buyers.subtract(big_errorers).select(
        F.lit("bigbuy_not_bigerror").alias("tag"), "user_id"
    )
    allu = ev.select("user_id").distinct().select(
        F.lit("distinct_users").alias("tag"), "user_id"
    )
    return (
        both.unionByName(only)
        .unionByName(allu)
        .groupBy("tag")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "set_bag_ops",
    oracle="""
    SELECT tag, COUNT(*) AS n_rows FROM (
      SELECT 'intersect_all' AS tag, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
      )
      UNION ALL
      SELECT 'except_all' AS tag, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
      )
    ) GROUP BY tag
    """,
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set algebra — `INTERSECT ALL` / `EXCEPT ALL` keep
    MULTIPLICITY (min / truncated-difference of per-value counts), which
    the distinct variants in `set_distinct_ops` destroy: 'how many click
    events does each user have beyond their purchase count' is a bag
    question. Spark's intersectAll/exceptAll plan as a single
    count-compare aggregate per side — one shuffle on the value, no
    row-pairing — the same shape at any scale."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    ia = clicks.intersectAll(buys).select(
        F.lit("intersect_all").alias("tag"), "user_id"
    )
    ea = clicks.exceptAll(buys).select(
        F.lit("except_all").alias("tag"), "user_id"
    )
    return (
        ia.unionByName(ea).groupBy("tag").agg(F.count("*").alias("n_rows"))
    )
