"""Source/sink operators (SURVEY.md §2.C scans).

Reference parity: A1 full-table scan (DMS full load,
lib/fin-transactions-stack.ts:161), A2/A4 JSON record encode/decode
(messageFormat JSON, lib/fin-transactions-stack.ts:135), A7 time-partitioned
lake layout (Firehose YYYY/MM/dd/HH prefix, lib/fin-transactions-stack.ts:196-199),
A18 line-delimited text file source (generatedata.py:17-19).

Scale notes: the parquet scan is the engine's hot path — project/filter are
expressed declaratively so Catalyst pushes them into the scan (verify with
.explain: PushedFilters / ReadSchema). The partitioned sink mirrors the
lake's hour-bucketing so downstream reads get partition pruning for free.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import cents, exact_sum
# Round-trip keys (write scratch, lazily read back) use pid_scratch_dir,
# never the shared scratch_dir: the readback executes at ACTION time, so
# a peer session's mode-overwrite on a shared dir could delete files
# under this session's running scan (and two overwrites interleave their
# _temporary commit dirs). The writes were per-invocation already, so
# per-process isolation costs nothing (r18 latent sweep of the r14
# cohort; the streaming keys' ADVICE r14 rationale applied to batch).
from ..io import load, pid_scratch_dir
from ..registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_qty
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY l_returnflag
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection + filter pushed into the reader
    (ref A1: DMS full load of customeractivity)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@query(
    "scan_json_lines",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON lines round-trip (ref A2/A4: DMS JSON messages
    landed by Firehose; bronze-layer read). Writes events as JSON lines to
    scratch, reads them back with an explicit schema, aggregates."""
    out = pid_scratch_dir(sf_dir, "scan_json_lines")
    ev = load(spark, sf_dir, "events")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(EVENTS_SCHEMA).json(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum(F.col("value")).alias("sum_value"),
    )


@query(
    "scan_text",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           COUNT(DISTINCT user_id) AS n_ids,
           MIN(user_id) AS min_id,
           MAX(user_id) AS max_id
    FROM (SELECT DISTINCT user_id FROM events) ids
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited text source/sink (ref A18: account_ids.txt,
    generatedata.py:17-19 / updateTables.py:48-49)."""
    out = pid_scratch_dir(sf_dir, "scan_text")
    ids = load(spark, sf_dir, "events").select("user_id").distinct()
    ids.select(F.col("user_id").cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(out)
    back = spark.read.text(out).select(F.col("value").cast("long").alias("user_id"))
    return back.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("user_id").alias("n_ids"),
        F.min("user_id").alias("min_id"),
        F.max("user_id").alias("max_id"),
    )


@query(
    "sink_partitioned",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS ingest_date,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned lake write + pruned read-back (ref A7: Firehose
    YYYY/MM/dd/HH UTC prefix, lib/fin-transactions-stack.ts:196-199)."""
    out = pid_scratch_dir(sf_dir, "sink_partitioned")
    ev = load(spark, sf_dir, "events").withColumn(
        "ingest_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("ingest_date").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy(
        F.col("ingest_date").cast("string").alias("ingest_date")
    ).agg(
        F.count("*").alias("n_rows"),
        exact_sum(F.col("value")).alias("sum_value"),
    )


@query(
    "scan_json_corrupt",
    oracle="""
    WITH classified AS (
      SELECT event_id,
             CASE WHEN event_id % 50 = 0 THEN 'corrupt' ELSE 'valid' END AS status
      FROM events
    )
    SELECT status, COUNT(*) AS n_rows
    FROM classified
    GROUP BY status
    """,
)
def scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read resilience (bronze contract, SURVEY §1.3): every 50th
    landed record is deterministically mangled into invalid JSON; the
    PERMISSIVE reader must park exactly those in _corrupt_record and parse
    the rest — a poison message must never kill the pipeline, and must
    never be silently dropped either."""
    out = pid_scratch_dir(sf_dir, "scan_json_corrupt")
    ev = load(spark, sf_dir, "events")
    # serialize each row to a JSON line, then truncate every 50th to
    # guarantee it cannot parse
    lines = ev.select(
        F.when(
            F.col("event_id") % 50 == 0,
            F.concat(F.lit("{bad "), F.substring(F.to_json(F.struct("*")), 1, 10)),
        )
        .otherwise(F.to_json(F.struct("*")))
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    schema = T.StructType(
        EVENTS_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # Spark refuses plans that reference ONLY _corrupt_record after pruning
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the real
    # bronze contract wants the split PERSISTED anyway — valid rows to the
    # silver path, corrupt originals to a quarantine partition — so write
    # the classified records and aggregate the readback.
    silver = pid_scratch_dir(sf_dir, "scan_json_corrupt_silver")
    (
        back.withColumn(
            "status",
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("corrupt"))
            .otherwise(F.lit("valid")),
        )
        .write.mode("overwrite")
        .partitionBy("status")
        .parquet(silver)
    )
    return (
        spark.read.parquet(silver)
        .groupBy("status")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "sql_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_base_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point (the engine surface is DataFrame AND SQL text —
    both compile to the same Catalyst plan): TPC-H Q1-shaped pricing
    summary via spark.sql over a registered temp view, with a parameterized
    date literal (ref A13: prepared statements, updateTables.py:19-21)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100 AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100 AS sum_base_price,
               COUNT(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= :cutoff
        GROUP BY l_returnflag, l_linestatus
        """,
        args={"cutoff": "1998-09-01 00:00:00"},
    )


# One SQL text, two engines: the whole point of the key is that the
# subqueries are written AS subqueries (not hand-decorrelated) and
# Catalyst's rewrite rules produce join plans. Exact-integer cross-
# multiply replaces `price > AVG(price)` so row membership can't flip on
# a float boundary between engines.
_SUBQUERY_SQL = """
    SELECT o.o_orderkey,
           o.o_custkey,
           CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS total_cents,
           (SELECT COUNT(*) FROM {lineitem} l2
             WHERE l2.l_orderkey = o.o_orderkey) AS n_items,
           NOT EXISTS (SELECT 1 FROM {lineitem} l3
                        WHERE l3.l_orderkey = o.o_orderkey
                          AND l3.l_returnflag = 'R') AS no_returns
    FROM {orders} o
    WHERE CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
            * (SELECT COUNT(*) FROM {orders} o2)
          > (SELECT SUM(CAST(ROUND(o3.o_totalprice * 100, 0) AS BIGINT))
               FROM {orders} o3)
      AND o.o_custkey IN (SELECT c_custkey FROM {customer}
                           WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM {lineitem} l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND l.l_discount >= 0.05)
"""


@query(
    "subquery_family",
    oracle=_SUBQUERY_SQL.format(
        orders="orders", lineitem="lineitem", customer="customer"
    ),
)
def subquery_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI subquery surface, written AS SUBQUERIES and left to
    Catalyst to decorrelate — all five shapes in one statement:
    uncorrelated scalar (global order count + cents sum, integer
    cross-multiplied so `price > average` is float-boundary-proof),
    correlated scalar in SELECT (per-order lineitem count — the COUNT
    shape that must coalesce to 0 on empty groups), correlated EXISTS,
    correlated NOT EXISTS, and uncorrelated IN.

    Scale shape: Catalyst rewrites these to the plans you'd hand-write —
    scalar subqueries execute once and inject as literals
    (ReusedSubquery), IN/EXISTS become semi joins, NOT EXISTS an anti
    join, and the correlated COUNT a pre-aggregated outer join
    (RewriteCorrelatedScalarSubquery) — every one a key-partitioned
    hash join, no per-row re-execution. tests/test_plans.py pins the
    no-nested-loop property; the identical SQL text is the DuckDB
    oracle."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        _SUBQUERY_SQL.format(
            orders="orders_v", lineitem="lineitem_v", customer="customer_v"
        )
    )


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS ingest_date,
           COUNT(*) AS n_rows
    FROM events
    WHERE CAST(ts AS DATE) <=
          (SELECT MIN(CAST(ts AS DATE)) FROM events) + 1
    GROUP BY 1
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition PRUNING on the time-partitioned lake (ref A7: the
    Firehose YYYY/MM/dd/HH prefix exists precisely so consumers read
    hours, not the lake): a date predicate on the partition column must
    be resolved against directory metadata — the scan lists only the
    matching partitions and never opens the rest. At 100 TB this is the
    difference between reading two days and reading three years; the
    plan-shape test asserts the predicate lands in PartitionFilters, not
    in a post-scan Filter. The first two calendar days are selected via a
    min() over the freshly written set so the query stays deterministic
    for the oracle (an agg job, not metadata-only — Spark's
    metadata-only-aggregate rewrite is disabled by default; at scale the
    cutoff would come from the partition directory listing instead)."""
    import datetime

    out = pid_scratch_dir(sf_dir, "scan_partition_pruned")
    ev = load(spark, sf_dir, "events").withColumn("ingest_date", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("ingest_date").parquet(out)
    back = spark.read.parquet(out)
    lo = back.agg(F.min("ingest_date")).first()[0]
    if lo is None:
        # a raise, not a None+timedelta TypeError: an empty lake means
        # there is no first-day cutoff to prune to (the sink_compacted
        # empty-feed refusal convention)
        raise RuntimeError(
            f"partition-pruned scan over {out} found no rows — cannot "
            "derive the two-day pruning cutoff from an empty lake"
        )
    cutoff = lo + datetime.timedelta(days=1)
    return (
        back.where(F.col("ingest_date") <= F.lit(cutoff))
        .groupBy(F.col("ingest_date").cast("string").alias("ingest_date"))
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "sink_compacted",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    """,
)
def sink_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION — the lake's chronic operational disease (ref
    A2: Firehose flushes every ~5 MiB or 300 s, lib/fin-transactions-
    stack.ts:192-206, so a quiet stream lands thousands of KB-sized
    objects; scan cost becomes per-FILE, not per-byte). Stage one
    simulates the fragmented landing zone (64 splits); stage two compacts
    by rewriting with a byte-budgeted partition count: ceil(input_bytes /
    128 MiB target), floored at one file. The returned checksum (count +
    key sum + exact cents) proves compaction moved every byte untouched;
    the file-count property is asserted in tests. On a real lake this
    runs per-partition behind the ingest watermark, so compaction never
    races the writer."""
    frag = pid_scratch_dir(sf_dir, "sink_compacted_frag")
    out = pid_scratch_dir(sf_dir, "sink_compacted")
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(64, "event_id").write.mode("overwrite").parquet(frag)

    landed = spark.read.parquet(frag)
    import math

    # Size the input through the Hadoop FileSystem API, NOT a driver-local
    # glob: on a non-local lake (s3a://, hdfs://) a local glob returns
    # empty, input_bytes would read 0, and the "compaction" degrades to a
    # repartition(1) single-writer full rewrite. df.inputFiles() is the
    # scan's own file list (any FS scheme), and the byte count is a
    # bounded per-file metadata loop — the same class of listing the scan
    # planner already did.
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    input_bytes = 0
    for uri in landed.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(uri)
        input_bytes += p.getFileSystem(hconf).getFileStatus(p).getLen()
    if input_bytes <= 0:
        # a raise, not an assert: the guard must survive python -O, or an
        # empty listing silently degrades compaction to a single-writer
        # full rewrite (the observe_metrics empty-feed refusal convention)
        raise RuntimeError(
            f"compaction input at {frag} lists no bytes — refusing to "
            "plan a repartition(1) full rewrite from an empty size "
            "estimate"
        )
    target = 128 * 1024 * 1024
    n_files = max(1, math.ceil(input_bytes / target))
    landed.repartition(n_files).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    c = cents(F.col("value"))
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("event_id").alias("id_sum"),
        F.sum(c).alias("value_cents"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT CASE WHEN event_id % 2 = 1 THEN event_type
                ELSE '__legacy__' END AS channel,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema EVOLUTION on the JSON lake (ref A2/A4: a schema-on-read lake
    accretes columns as the OLTP source evolves): an old batch lands
    without `channel`, a newer batch carries it. One unified read over
    both generations must surface the union schema, with the missing
    column null-backfilled for legacy rows — never a rewrite of old data,
    never a broken reader. The aggregate buckets legacy rows under
    '__legacy__' and new rows by their channel.

    Spark mechanics: the JSON reader is given the EVOLVED schema
    explicitly (bronze contract: the lake's current declared schema reads
    every older generation; absent fields parse as null). At 100 TB this
    is the only viable path — column addition is a metadata-only change,
    all historical files stay byte-identical."""
    out = pid_scratch_dir(sf_dir, "scan_schema_evolution")
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        cents(F.col("value")).alias("cents"),
        "event_type",
    )
    # NULL ids route to the legacy generation EXPLICITLY: `% 2 == 0` is
    # NULL-rejecting, so without the isNull() leg a NULL-id row would
    # land in NEITHER file set — dropped from the lake — while the
    # oracle's CASE (NULL % 2 <> 1 -> ELSE) buckets it '__legacy__'.
    # The fixture generator emits no NULL ids; foreign data may.
    old_gen = ev.where(
        (F.col("event_id") % 2 == 0) | F.col("event_id").isNull()
    ).select("event_id", "user_id", "cents")
    new_gen = ev.where(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "cents", F.col("event_type").alias("channel")
    )
    old_gen.write.mode("overwrite").json(out + "/gen1")
    new_gen.write.mode("overwrite").json(out + "/gen2")
    evolved = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("cents", T.LongType()),
            T.StructField("channel", T.StringType()),
        ]
    )
    back = spark.read.schema(evolved).json([out + "/gen1", out + "/gen2"])
    # Bucket by the SAME rule the oracle states: generation membership
    # (event_id parity — the split that wrote the two file sets), not
    # channel NULLness. coalesce(channel) is identical on today's data
    # but would silently fold a new-generation row whose channel is
    # genuinely NULL into '__legacy__', while the oracle keeps it NULL.
    return (
        back.groupBy(
            F.when(F.col("event_id") % 2 == 1, F.col("channel"))
            .otherwise(F.lit("__legacy__"))
            .alias("channel")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents"),
        )
    )


# One text, two engines (same discipline as _SUBQUERY_SQL): ancestor
# walk over the implicit binary-id hierarchy. CAST(FLOOR(node / 2) AS
# BIGINT), never a bare double->int cast: Spark truncates that cast,
# DuckDB ROUNDS it (3/2 -> 2), silently forking the walk. FLOOR is
# identical everywhere and the division is exact below 2^53.
_RECURSIVE_SQL = """
    WITH RECURSIVE walk(custkey, node, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM {customer}
      UNION ALL
      SELECT custkey, CAST(FLOOR(node / 2) AS BIGINT), depth + 1
      FROM walk WHERE node > 1
    )
    SELECT custkey,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(SUM(node) AS BIGINT) AS path_sum
    FROM walk
    GROUP BY custkey
"""


@query(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL.format(customer="customer"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): the hierarchy-walk /
    transitive-closure SQL surface — every customer id walks its
    binary-ancestor chain (node -> node div 2) to the root, emitting
    walk depth and the path-sum checksum. This is the query family
    (org charts, bill-of-materials, graph closure) that previously
    required the hand-rolled iterative-join loop `connected_components`
    implements; the declarative form now runs inside one statement on
    both engines, and the identical text IS the oracle.

    Scale shape: each recursion level is one self-union + filter over
    the frontier — Catalyst executes level-by-level with the frontier
    shrinking geometrically (depth <= log2(max id) ~ 20 here); the
    recursion-depth guard (spark.sql.cteRecursionLevelLimit) bounds
    runaway closures the same way CC_MAX_ITERS does for the manual
    loop."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(_RECURSIVE_SQL.format(customer="customer_v"))


_LATERAL_SQL = """
    SELECT c.c_custkey,
           c.c_mktsegment,
           t.o_orderkey,
           t.cents
    FROM {customer} c, LATERAL (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM {orders} o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
"""


@query(
    "join_lateral",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-row top-N idiom written
    the way an analyst writes it (each customer's 2 largest orders via
    a correlated ORDER BY ... LIMIT subquery) instead of the window
    formulation `topk_per_group` uses. The point of the key is what
    Catalyst does with it: DecorrelateInnerQuery rewrites the per-row
    subquery into ONE windowed rank over orders plus a hash join —
    verified by the plan test (Window + BroadcastHashJoin, no
    nested-loop re-execution per customer row). Identical text runs on
    DuckDB as the oracle.

    Scale shape: after decorrelation the cost is exactly
    `topk_per_group`'s — one shuffle on the correlation key, rank
    within partitions, join back. A naive engine would re-run the
    subquery per outer row; the plan pin is the proof we don't."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        _LATERAL_SQL.format(customer="customer_v", orders="orders_v")
    )


# --- write-audit-publish ----------------------------------------------------

WAP_CAP_CENTS = 30000  # strict audit: no staged row may exceed 300.00

_WAP_ORACLE = f"""
WITH staged AS (
  SELECT event_id, user_id, value FROM events WHERE event_id % 3 = 0
), audit AS (
  SELECT 'value_positive' AS rule,
         SUM(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS n_viol
  FROM staged
  UNION ALL
  SELECT 'value_cap_300',
         SUM(CASE WHEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  > {WAP_CAP_CENTS} THEN 1 ELSE 0 END)
  FROM staged
)
SELECT a.rule,
       CAST((SELECT COUNT(*) FROM staged) AS BIGINT) AS n_staged,
       CAST(a.n_viol AS BIGINT) AS n_violations,
       a.n_viol = 0 AS published,
       CAST(CASE WHEN a.n_viol = 0
                 THEN (SELECT COUNT(*) FROM staged) ELSE 0 END AS BIGINT)
         AS n_published,
       CAST(CASE WHEN a.n_viol = 0
                 THEN 0 ELSE (SELECT COUNT(*) FROM staged) END AS BIGINT)
         AS n_quarantined
FROM audit a
ORDER BY rule
"""


@query("sink_write_audit_publish", oracle=_WAP_ORACLE)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH (the Iceberg/lakehouse governance flow): a
    batch lands in a STAGING area, data-quality audits run against the
    staged files — never the live table — and only a fully-green audit
    promotes the batch to the published location; a red audit routes it
    to quarantine instead. Two audits run here: a positivity rule that
    passes (batch publishes) and a strict cap rule that fails (the same
    batch quarantines), so BOTH promotion paths execute with real
    writes, and the emitted counts are READ BACK from the promoted
    directories — the manifest certifies effects on disk, not
    intentions.

    Scale shape: the audit is one conditional-aggregate scan of the
    staged files (dq_expectations' shape); promotion is a metadata-cheap
    directory publish in a real table format — modeled here as a
    rewrite because plain parquet has no atomic rename, which is
    exactly the gap WAP + table formats close at 100 TB.

    Every wap_* dir is PID-keyed via io.pid_scratch_dir (ADVICE r15:
    the sibling verdict-flip clear on SHARED scratch could rmtree a dir
    a concurrent session was reading — the same cross-process race
    class the streaming family closed in r15). Each process now stages,
    publishes, and quarantines in its own pid dir; the sibling clear
    only ever touches this process's opposite-verdict dir."""
    staged_dir = pid_scratch_dir(sf_dir, "wap_staging")
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 3 == 0)
    ev.select("event_id", "user_id", "value").write.mode(
        "overwrite"
    ).parquet(staged_dir)
    staged = spark.read.parquet(staged_dir)

    rules = [
        ("value_positive", F.col("value") <= 0),
        (
            "value_cap_300",
            cents(F.col("value"))
            > WAP_CAP_CENTS,
        ),
    ]
    # ONE conditional-aggregate scan audits every rule (dq_expectations'
    # shape, aggregates.py:1033) — a per-rule pre-scan pays the full
    # staged-file read once per rule, and at 100 TB the audit must cost
    # one scan regardless of how many expectations the suite carries.
    # The bounded collect is the audit verdict: one row, len(rules)+1
    # counters.
    audit = staged.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(viol, 1).otherwise(0)).alias(f"v_{i}")
            for i, (_, viol) in enumerate(rules)
        ],
    ).collect()[0]
    if int(audit.n) == 0:
        # an empty staging area would "pass" every violation-count rule
        # and publish nothing while reporting green — refuse loudly, the
        # scan_partition_pruned/sink_zorder_lake empty-input discipline
        raise RuntimeError(
            f"sink_write_audit_publish: staged batch at {staged_dir} is "
            "empty — audit verdicts over zero rows are vacuous"
        )
    rows = []
    for i, (rule, _) in enumerate(rules):
        n_viol = int(audit[f"v_{i}"])
        ok = n_viol == 0
        target = pid_scratch_dir(
            sf_dir, f"wap_{'published' if ok else 'quarantine'}_{rule}"
        )
        # a verdict FLIP across runs (rule or data changed) would leave
        # the opposite verdict's directory from the prior run looking
        # committed — a reader listing wap_published_* must never see a
        # batch this run quarantined; clear the sibling before promoting
        # (pid_scratch_dir clears ITS OWN pid dir on entry, so the call
        # below is the clear — and it can only touch this process's dir)
        pid_scratch_dir(
            sf_dir, f"wap_{'quarantine' if ok else 'published'}_{rule}"
        )
        # pid_scratch_dir cleared the target; overwrite rewrites it
        staged.write.mode("overwrite").parquet(target)
        n_target = spark.read.parquet(target).count()
        rows.append(
            (
                rule,
                int(audit.n),
                n_viol,
                ok,
                n_target if ok else 0,
                0 if ok else n_target,
            )
        )
    return spark.createDataFrame(
        rows,
        "rule string, n_staged bigint, n_violations bigint,"
        " published boolean, n_published bigint, n_quarantined bigint",
    )


_CODEC_ORACLE = """
SELECT codec,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
CROSS JOIN (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
GROUP BY codec
ORDER BY codec
"""


@query("sink_compression_codecs", oracle=_CODEC_ORACLE)
def sink_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar COMPRESSION-CODEC round-trip: the same relation written
    as parquet under snappy (the balanced default), zstd (best
    ratio/speed trade at rest — the modern lake default), and gzip
    (legacy max-ratio), each read back and reduced to exact counts —
    the codec must be a pure storage concern, invisible to values.

    Scale shape: codec choice is THE cheapest 100 TB lever after
    partitioning (zstd typically ~30% smaller than snappy at similar
    scan speed, which is 30% less S3/network IO on every future scan);
    each write is one partition-parallel pass, and the readback proves
    splittable decode. Counts, not byte sizes, are asserted — sizes
    vary by writer version, values never may."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    rows = []
    for codec in ("gzip", "snappy", "zstd"):
        out = pid_scratch_dir(sf_dir, f"sink_codec_{codec}")
        ev.write.mode("overwrite").option("compression", codec).parquet(out)
        back = spark.read.parquet(out)
        r = back.agg(
            F.count("*").alias("n"),
            F.sum(
                cents(F.col("value"))
            ).alias("s"),
        ).collect()[0]
        rows.append((codec, int(r.n), int(r.s)))
    return spark.createDataFrame(
        rows, "codec string, n_rows bigint, sum_cents bigint"
    )
