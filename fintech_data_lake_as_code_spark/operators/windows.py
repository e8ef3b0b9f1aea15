"""Window-function operators (SURVEY.md §2.C windows).

Reference parity: B1 city-hop lag detection (setupTables.py:31), B3 running
balance (setupTables.py:33-34), B5 consecutive-day islands
(setupTables.py:37).

Scale notes: the per-entity windows (user_id / account keys) partition by
a high-cardinality key so state per partition stays small, and ordering
keys always include a unique tiebreaker (event_id / custkey) for
deterministic results under re-execution. Two operators are the honest
exception: `win_ranking` (5 c_mktsegment partitions) and
`win_distribution` (3 o_orderstatus partitions) rank within
LOW-cardinality business partitions because that is what the analytic
means — which makes each partition a single sorted task, fine at fixture
scale but a straggler at 100 TB. The scale path for global/low-cardinality
exact ranking is the `win_rfm_score` pattern in this module: one
approx-cut-point aggregate, map-side bucketing over broadcast cut points,
then per-bucket rank + offsets reconstructing the exact global rank with
no single-partition sort. These two keys keep the direct window form
deliberately, as the API-surface representatives of
percent_rank/cume_dist/ntile/rank semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import cents, unscale
from ..io import load
from ..registry import query


@query(
    "win_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal, 2) AS acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per partition."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS DOUBLE) / 100
             AS value_amt,
           CAST(LAG(CAST(ROUND(value * 100, 0) AS BIGINT), 1, 0) OVER w
                AS DOUBLE) / 100 AS prev_value,
           CAST(LEAD(CAST(ROUND(value * 100, 0) AS BIGINT), 1, 0) OVER w
                AS DOUBLE) / 100 AS next_value,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults + inter-event gap (ref B1 city-hop base,
    setupTables.py:31).

    Values go through the exact-cents scale (functions/exact.py), not
    ROUND(value, 2): on half-cent doubles Spark's decimal-string ROUND
    and DuckDB's binary ROUND disagree by one cent (9.905 -> 9.91 vs
    9.90) — caught by the r17 seeded-net sweep the first time this key
    met the .5-cent value grid."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        unscale(c).alias("value_amt"),
        unscale(F.lag(c, 1, 0).over(w)).alias("prev_value"),
        unscale(F.lead(c, 1, 0).over(w)).alias("next_value"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )


@query(
    "win_running_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS running_total,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER mv AS DOUBLE)
             / (COUNT(*) OVER mv * 100) AS moving_avg_5
    FROM events
    WINDOW mv AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + bounded moving average with explicit frames (ref B3
    running balance, setupTables.py:33-34).

    Both aggregates run over integer CENTS (functions/exact.py), not
    ROUND(SUM(value), 2): a running FLOAT sum is order-dependent and its
    half-cent boundaries round differently per engine (the r17 seeded-net
    sweep caught one-cent flips the first time this key met the .5-cent
    grid); the moving average divides the exact cents sum by the exact
    frame count — the same integers in both engines, hence the same
    double."""
    ev = load(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = base.rowsBetween(-4, Window.currentRow)
    c = cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        unscale(F.sum(c).over(running)).alias("running_total"),
        (
            F.sum(c).over(moving).cast("double")
            / (F.count(F.lit(1)).over(moving) * 100)
        ).alias("moving_avg_5"),
    )


@query(
    "win_islands_consecutive",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ), islands AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
               AS island_key
      FROM daily
    )
    SELECT user_id, CAST(MIN(day) AS VARCHAR) AS run_start, COUNT(*) AS run_len
    FROM islands
    GROUP BY user_id, island_key
    HAVING COUNT(*) >= 3
    """,
)
def win_islands_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of >=3 consecutive active days per user
    (ref B5 'maximum UPI spend on 3 consecutive days', setupTables.py:37)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = daily.withColumn(
        "island_key", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        islands.groupBy("user_id", "island_key")
        .agg(F.min("day").alias("_run_start"), F.count("*").alias("run_len"))
        .where(F.col("run_len") >= 3)
        .select(
            "user_id",
            F.col("_run_start").cast("string").alias("run_start"),
            "run_len",
        )
    )


SESSION_GAP_S = 1800


@query(
    "win_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS e,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_S}
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), numbered AS (
      SELECT user_id, e,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(e) AS session_start_epoch,
           MAX(e) AS session_end_epoch,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks after an 1800 s (SESSION_GAP_S)
    silence. The classic two-window formulation — mark session starts with
    lag(), number sessions with a running sum — then aggregate per session.
    ONE shuffle on user_id serves both windows and the final groupBy
    (partitioning reuse); the streaming twin is `stream_session`
    (session_window does this incrementally with state)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = F.unix_timestamp("ts")
    is_start = F.when(
        (e - F.lag(e).over(w) > SESSION_GAP_S) | F.lag("ts").over(w).isNull(),
        F.lit(1),
    ).otherwise(F.lit(0))
    # number sessions in FULL (ts, event_id) order — epoch-second order
    # alone is ambiguous for same-second events and engine-divergent
    marked = ev.select(
        "user_id", "ts", "event_id", e.alias("e"), is_start.alias("is_start")
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.select(
        "user_id",
        "e",
        F.sum("is_start").over(wrun).cast("bigint").alias("session_id"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("e").alias("session_start_epoch"),
        F.max("e").alias("session_end_epoch"),
        F.count("*").alias("n_events"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(10) OVER w AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile per
    status partition — both are exact rank ratios ((rank-1)/(n-1),
    rank/n), so the doubles are identical on any engine; orderkey
    tiebreak keeps ranks deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "win_range_interval",
    oracle="""
    SELECT user_id, event_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_epoch,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
             AS hour_cents,
           COUNT(*) OVER w AS hour_n
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the rolling trailing-hour spend
    (sum of cents) and event count — the frame is bounded by the ORDER-key
    VALUE (epoch seconds within 3600), not a row count, so bursts and
    silences change the frame population. This is the velocity feature
    behind the reference's rate rules (B1's within-an-hour bound,
    setupTables.py:31) expressed as a windowed aggregate rather than a
    lag comparison.

    Scale: one shuffle on user_id, then a per-partition sort with a
    two-pointer frame scan — no self-join against the hour window (the
    range-join formulation of the same feature shuffles the fact table
    twice and explodes pairs). RANGE frames include ALL rows tied on the
    order key, identical in Spark and the oracle, so the result is
    deterministic without a tiebreak column."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.sum(cents(F.col("value")))
        .over(w)
        .alias("hour_cents"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@query(
    "win_funnel_conversion",
    oracle="""
    WITH views AS (
      SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), clicks AS (
      SELECT e.user_id, CAST(floor(epoch(min(e.ts))) AS BIGINT) AS t_click
      FROM events e JOIN views v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND CAST(floor(epoch(e.ts)) AS BIGINT) > v.t_view
        AND CAST(floor(epoch(e.ts)) AS BIGINT) <= v.t_view + 3 * 86400
      GROUP BY e.user_id
    ), purchases AS (
      SELECT e.user_id, CAST(floor(epoch(min(e.ts))) AS BIGINT) AS t_purchase
      FROM events e JOIN clicks c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(floor(epoch(e.ts)) AS BIGINT) > c.t_click
        AND CAST(floor(epoch(e.ts)) AS BIGINT) <= c.t_click + 7200
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS funnel_stage
    FROM views v
    LEFT JOIN clicks c ON v.user_id = c.user_id
    LEFT JOIN purchases p ON c.user_id = p.user_id
    """,
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence (funnel) matching: per user, the first view,
    the first click strictly AFTER that view (within a 3-day horizon), and
    the first purchase strictly after that click (within a 2-hour
    horizon) — `funnel_stage` counts how deep each user got. This is
    MATCH_RECOGNIZE-lite expressed as stage-wise filtered aggregations
    joined on user_id: every stage is one filtered groupBy + an equi-join
    against the previous stage's anchor time, so the whole funnel costs
    three narrow shuffles on the SAME key (co-partitioned end to end; AQE
    collapses the exchanges) and holds no per-user state — the shape that
    survives 100 TB of events where a per-user sort-and-scan UDF would
    not. BOTH stage horizons bound candidate ranges the way a production
    funnel bounds state retention, and they are sized so every
    funnel_stage value actually occurs at every generated sf — the
    original unbounded purchase stage matched for every clicker, so the
    stage-2 LEFT-JOIN null path graded vacuously (the filter_pred
    lesson). Epoch-seconds comparisons keep both engines identical."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("te")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("te").alias("t_view"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(
            (F.col("te") > F.col("t_view"))
            & (F.col("te") <= F.col("t_view") + 3 * 86400)
        )
        .groupBy("user_id")
        .agg(F.min("te").alias("t_click"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(
            (F.col("te") > F.col("t_click"))
            & (F.col("te") <= F.col("t_click") + 7200)
        )
        .groupBy("user_id")
        .agg(F.min("te").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stage.alias("funnel_stage"),
        )
    )


@query(
    "win_asof_gap_fill",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
             CAST(floor(epoch(ts)) AS BIGINT) AS te, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ), hourly AS (
      SELECT user_id, hour_epoch, cents FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hour_epoch
                                     ORDER BY te DESC, event_id DESC) AS rn
        FROM ev) t WHERE rn = 1
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(min(hour_epoch), max(hour_epoch), 3600))
               AS hour_epoch
      FROM hourly GROUP BY user_id
    )
    SELECT s.user_id, s.hour_epoch,
           last_value(h.cents IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.hour_epoch
                   ROWS UNBOUNDED PRECEDING) AS cents_filled,
           h.cents IS NOT NULL AS is_observed
    FROM spine s LEFT JOIN hourly h USING (user_id, hour_epoch)
    """,
)
def win_asof_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style GAP FILL + LOCF (last observation carried forward):
    per user, a dense hourly spine from first to last active hour; hours
    with no events inherit the latest observed value (`is_observed` marks
    real vs filled rows). This is the time_bucket_gapfill/locf surface of
    a time-series store (ref A7's hour-bucketed lake) as three relational
    steps: (1) reduce events to one deterministic row per (user, hour) —
    last event by (ts, event_id); (2) build the spine MAP-SIDE with
    explode(sequence(min_hour, max_hour, 3600)) — spine size is bounded by
    the time span, never by event volume; (3) one left join + an
    ignore-nulls last() window. Everything shuffles on user_id only, so
    the reduce, join and fill co-partition; epoch-second integer hours
    keep both engines identical (UTC pinned by io.load)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        F.unix_timestamp("ts").alias("te"),
        "event_id",
        cents(F.col("value")).alias("cents"),
    )
    w_last = Window.partitionBy("user_id", "hour_epoch").orderBy(
        F.desc("te"), F.desc("event_id")
    )
    hourly = (
        ev.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "hour_epoch", "cents")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_epoch").alias("h0"), F.max("hour_epoch").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.lit(3600))
            ).alias("hour_epoch"),
        )
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour_epoch"], "left")
        .select(
            "user_id",
            "hour_epoch",
            F.last("cents", ignorenulls=True).over(wf).alias("cents_filled"),
            F.col("cents").isNotNull().alias("is_observed"),
        )
    )


# --- rolling anomaly detection -----------------------------------------------

Z_WIN = 20       # trailing history window (rows), current row excluded
Z_MIN_PRIOR = 5  # no verdict on thin history
Z_SIGMA_SQ = 9   # flag beyond 3 sigma (compared as z^2 > 9, exactly)


@query(
    "win_anomaly_zscore",
    oracle=f"""
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ), m AS (
      SELECT event_id, user_id, cents,
             COUNT(*) OVER w AS n_prior,
             SUM(cents) OVER w AS s1,
             SUM(cents * cents) OVER w AS s2
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {Z_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, cents, CAST(n_prior AS BIGINT) AS n_prior
    FROM m
    WHERE n_prior >= {Z_MIN_PRIOR}
      AND (n_prior * cents - s1) * (n_prior * cents - s1)
          > {Z_SIGMA_SQ} * (n_prior * s2 - s1 * s1)
    """,
)
def win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection — the velocity-anomaly shape
    behind the reference's investigation rules (ref B3/B5 family,
    setupTables.py:33-37): flag any event whose amount deviates more
    than 3 sigma from the SAME user's trailing 20-event history
    (current row excluded — the verdict must not contaminate its own
    baseline; no verdict under 5 prior events).

    The test is evaluated in EXACT INTEGERS: with trailing count n and
    cent sums s1 = Σx, s2 = Σx², `|x-μ| > 3σ` is algebraically
    `(n·x - s1)² > 9·(n·s2 - s1²)` — no division, no float, no sqrt, so
    the flag is bit-identical in any engine (the same moments-not-floats
    convention as agg_stats_corr). Bounds: cents ~ 10^5, n <= 20
    keeps every term far inside int64.

    Scale shape: one shuffle on user_id, one sort per partition, three
    running aggregates over the same frame — the plan cost is the
    sessionize/lag family's; emitted rows are only the anomalies."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        "user_id",
        "ts",
        cents(F.col("value")).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-Z_WIN, -1)
    )
    m = c.select(
        "event_id",
        "user_id",
        "cents",
        F.count("*").over(w).alias("n_prior"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
    )
    dev = F.col("n_prior") * F.col("cents") - F.col("s1")
    var_n2 = F.col("n_prior") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        m.where(
            (F.col("n_prior") >= Z_MIN_PRIOR)
            & (dev * dev > Z_SIGMA_SQ * var_n2)
        )
        .select(
            "event_id",
            "user_id",
            "cents",
            F.col("n_prior").cast("bigint").alias("n_prior"),
        )
    )


EWMA_LAGS = 8  # geometric weights 2^7..2^0 over the trailing 8 events

_EWMA_ORACLE = """
WITH cents AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
), lagged AS (
  SELECT event_id, user_id, c,
         LAG(c, 1) OVER w AS c1, LAG(c, 2) OVER w AS c2,
         LAG(c, 3) OVER w AS c3, LAG(c, 4) OVER w AS c4,
         LAG(c, 5) OVER w AS c5, LAG(c, 6) OVER w AS c6,
         LAG(c, 7) OVER w AS c7,
         ROW_NUMBER() OVER w AS rn
  FROM cents
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, c AS amount_cents,
       CAST((128 * c + 64 * c1 + 32 * c2 + 16 * c3 + 8 * c4
             + 4 * c5 + 2 * c6 + 1 * c7) // 255 AS BIGINT) AS ewma_cents,
       CAST((128 * c + 64 * c1 + 32 * c2 + 16 * c3 + 8 * c4
             + 4 * c5 + 2 * c6 + 1 * c7) // 255 - c AS BIGINT) AS ewma_gap
FROM lagged
WHERE rn >= 8
"""


@query("win_ewma", oracle=_EWMA_ORACLE)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of per-user spend — the
    classic online-feature smoother (alpha = 1/2 truncated at 8 taps,
    which bounds the dropped tail below one part in 256). Weights are
    POWERS OF TWO over integer cents, so the weighted sum and its
    floor-divide by 255 are bit-exact in any engine — no float
    recurrence, no reduction-order sensitivity. Rows before the 8th
    event are withheld (the warm-up a production feature store would
    backfill).

    Scale shape: one user_id shuffle; all eight lags share ONE window
    frame (WindowExec evaluates them in a single pass over each sorted
    partition); everything downstream is codegen arithmetic. The
    recurrence form s_t = a*x_t + (1-a)*s_{t-1} is inherently
    sequential — the truncated-tap form is what makes EWMA a
    single-window-pass operator at 100 TB."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = cents(F.col("value"))
    base = ev.select("event_id", "user_id", "ts", c.alias("c"))
    lags = [F.col("c")] + [
        F.lag("c", i).over(w) for i in range(1, EWMA_LAGS)
    ]
    weighted = sum(
        (lag * F.lit(2 ** (EWMA_LAGS - 1 - i)) for i, lag in enumerate(lags)),
        start=F.lit(0),
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("wsum", weighted)
        .where(F.col("rn") >= EWMA_LAGS)
        .select(
            "event_id",
            "user_id",
            F.col("c").alias("amount_cents"),
            F.expr("wsum div 255").cast("bigint").alias("ewma_cents"),
            (F.expr("wsum div 255") - F.col("c"))
            .cast("bigint")
            .alias("ewma_gap"),
        )
    )


RESAMPLE_STEP_S = 21600  # 6-hour grid

_RESAMPLE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e,
         MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(e) AS emin, MAX(e) AS emax FROM ev GROUP BY 1
), grid AS (
  SELECT user_id,
         emin + {RESAMPLE_STEP_S} * unnest(generate_series(
           0, CAST((emax - emin) // {RESAMPLE_STEP_S} AS BIGINT))) AS ge
  FROM span
), pts AS (
  SELECT user_id, e, 0 AS is_grid, v FROM ev
  UNION ALL
  SELECT user_id, ge, 1, NULL FROM grid
), filled AS (
  SELECT user_id, e, is_grid,
         last_value(v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS)
           OVER w_prev AS pe,
         first_value(v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS)
           OVER w_next AS ne
  FROM pts
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY e, is_grid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY user_id ORDER BY e, is_grid
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, e AS grid_epoch,
       CAST((pv * (ne - e) + nv * (e - pe)) // (ne - pe) AS BIGINT)
         AS interp_cents
FROM filled
WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL AND ne > pe
"""


@query("win_resample_interp", oracle=_RESAMPLE_ORACLE)
def win_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLING onto a regular per-user grid with LINEAR
    interpolation between the surrounding observations — the hypertable
    operation `win_asof_gap_fill`'s LOCF can't express (Timescale's
    `time_bucket_gapfill` + `interpolate`, Pandas' `resample().
    interpolate()`). Each user gets a 21600-second (RESAMPLE_STEP_S) grid over
    their own observation span; every grid point takes the
    distance-weighted average of its neighbors, evaluated ALL-INTEGER:
    cents x nonnegative second-weights summed then integer-divided.
    Spark's `div` and DuckDB's `//` BOTH truncate toward zero (verified:
    -7 div 2 = -7 // 2 = -3), so they agree on any sign; with every
    operand nonnegative here, truncation equals flooring anyway.

    Scale shape: the grid explodes from ONE tiny per-user span row
    (sequence() map-side — never a driver loop); events collapse to one
    row per (user, second) with a partial-agg groupBy; both neighbor
    lookups are IGNORE-NULLS frames over a single user_id
    shuffle+sort — two window passes, zero joins. At 100 TB this is the
    resample shape that beats the naive grid x events as-of join by the
    grid's fan-out factor."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("e"),
            cents(F.col("value")).alias("v"),
        )
        .groupBy("user_id", "e")
        .agg(F.max("v").alias("v"))
    )
    span = ev.groupBy("user_id").agg(
        F.min("e").alias("emin"), F.max("e").alias("emax")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"(emax - emin) div {RESAMPLE_STEP_S}"),
            )
        ).alias("i"),
        "emin",
    ).select(
        "user_id",
        (F.col("emin") + F.lit(RESAMPLE_STEP_S) * F.col("i")).alias("e"),
    )
    pts = ev.select(
        "user_id", "e", F.lit(0).alias("is_grid"), "v"
    ).unionByName(
        grid.select(
            "user_id", "e", F.lit(1).alias("is_grid"),
            F.lit(None).cast("bigint").alias("v"),
        )
    )
    base = Window.partitionBy("user_id").orderBy("e", "is_grid")
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    e_obs = F.when(F.col("v").isNotNull(), F.col("e"))
    filled = pts.select(
        "user_id",
        "e",
        "is_grid",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(e_obs, ignorenulls=True).over(w_prev).alias("pe"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(e_obs, ignorenulls=True).over(w_next).alias("ne"),
    )
    return (
        filled.where(
            (F.col("is_grid") == 1)
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("ne") > F.col("pe"))
        )
        .select(
            "user_id",
            F.col("e").alias("grid_epoch"),
            F.expr("(pv * (ne - e) + nv * (e - pe)) div (ne - pe)")
            .cast("bigint")
            .alias("interp_cents"),
        )
    )


_MATCH_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'v[cse]*p')) AS BIGINT)
         AS n_funnels,
       CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
         AS n_error_bursts
FROM seqs
"""


@query("win_match_recognize", oracle=_MATCH_ORACLE)
def win_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PATTERN MATCHING over ordered event streams — the
    MATCH_RECOGNIZE / funnel-regex surface (each user's history becomes
    a string of event-type initials; patterns are regexes over it):
    `v[cse]*p` counts view-to-purchase funnels with no intervening
    purchase, `ee+` counts error bursts. Non-overlapping leftmost
    matching in both engines, so counts are exact.

    Scale shape: ONE groupBy(user) builds each sequence —
    sort_array(collect_list(struct(ts, event_id, initial))) makes the
    concatenation order deterministic regardless of partitioning (a
    bare collect_list is arrival-ordered and would be flaky); the regex
    then runs once per USER, not per event. Per-user history strings
    are bounded by retention in a real lake; at 100 TB the same shape
    runs per (user, day) to cap state."""
    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ini"),
                        )
                    )
                ),
                lambda s: s.ini,
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.size(F.expr("regexp_extract_all(seq, 'v[cse]*p', 0)"))
        .cast("bigint")
        .alias("n_funnels"),
        F.size(F.expr("regexp_extract_all(seq, 'ee+', 0)"))
        .cast("bigint")
        .alias("n_error_bursts"),
    )


_DRAWDOWN_ORACLE = """
WITH flows AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN -CAST(ROUND(value * 100, 0) AS BIGINT)
              ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END AS flow
  FROM events
), running AS (
  SELECT user_id, ts, event_id,
         SUM(flow) OVER w AS balance
  FROM flows
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), bal AS (
  SELECT user_id, balance,
         MAX(balance) OVER w AS peak
  FROM running
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(MAX(peak) AS BIGINT) AS peak_cents,
       CAST(MAX(peak - balance) AS BIGINT) AS max_drawdown_cents
FROM bal GROUP BY user_id
"""


@query("win_drawdown", oracle=_DRAWDOWN_ORACLE)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per account — the canonical fintech risk metric
    (largest peak-to-trough drop of the running balance, purchases as
    outflows): a running integer-cents balance, its running peak, and
    the max gap, all exact by integer arithmetic.

    Scale shape: one user_id shuffle serves both chained window stages
    (running sum, then running max over it — same partitioning and sort,
    so no second exchange or sort) and the final groupBy. The
    sequential-looking metric is windowable because peak is itself a
    running aggregate — no iteration, no UDF."""
    ev = load(spark, sf_dir, "events")
    c = cents(F.col("value"))
    flow = F.when(F.col("event_type") == "purchase", -c).otherwise(c)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = ev.select(
        "user_id", "ts", "event_id", flow.alias("flow")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.sum("flow").over(w).alias("balance"),
    )
    bal = running.select(
        "user_id",
        "balance",
        F.max("balance").over(w).alias("peak"),
    )
    return bal.groupBy("user_id").agg(
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.max(F.col("peak") - F.col("balance"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
    )


_TRANSITION_ORACLE = """
WITH pairs AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, COUNT(*) AS c
  FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
), row_totals AS (
  SELECT cur, SUM(c) AS total FROM counts GROUP BY cur
)
SELECT c.cur, c.nxt,
       CAST(c.c AS BIGINT) AS n_transitions,
       CAST((10000 * c.c) // t.total AS BIGINT) AS prob_bp
FROM counts c JOIN row_totals t ON c.cur = t.cur
"""


@query("win_transition_matrix", oracle=_TRANSITION_ORACLE)
def win_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV TRANSITION MATRIX of the user journey: for
    every ordered (current, next) event-type pair, the transition count
    and its row-conditional probability in integer basis points — the
    user-flow model behind journey analytics, churn prediction
    features, and next-action baselines.

    Scale shape: consecutive pairs come from ONE lead() pass over the
    per-user sort (the same single-shuffle shape as win_lag_lead); the
    transition matrix itself is |event_types|^2-sized — the classic
    collapse from row-scale to model-scale in one partial-agg groupBy.
    Probabilities divide integers (10000*c // total), exact in both
    engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(F.count("*").alias("c"))
    totals = counts.groupBy("cur").agg(F.sum("c").alias("total"))
    return counts.join(totals, "cur").select(
        "cur",
        "nxt",
        F.col("c").cast("bigint").alias("n_transitions"),
        F.expr("(10000 * c) div total").cast("bigint").alias("prob_bp"),
    )


_RFM_ORACLE = """
WITH base AS (
  SELECT user_id,
         MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS last_seen,
         COUNT(*) AS frequency,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS monetary_cents
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(NTILE(5) OVER (ORDER BY last_seen, user_id) AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT)
         AS m_score,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_cents AS BIGINT) AS monetary_cents
FROM base
"""


# Approx cut points per RFM dimension: 32 cuts -> up to 33 coarse
# buckets, so the per-bucket rank windows run ~33-way parallel instead
# of on one partition. Cut VALUES never affect correctness (any
# monotone coarsening of the order works — exact ranks come from
# bucket offsets + within-bucket row_number), only parallelism/skew.
RFM_CUTS = 32


def _bucket_expr(dim: str, cuts: list):
    """Map-side coarse bucket: #literal-cuts strictly below my value.

    A whole-stage-codegen comparison chain over driver-side literals —
    no UDF, no lookup join. Monotone in `dim`, so bucketing is a
    coarsening of the (dim, user_id) order; nulls coalesce to the
    lowest bucket, matching orderBy's NULLS FIRST."""
    uniq = sorted({c for c in cuts if c is not None})
    bucket = F.lit(0)
    for c in uniq:
        bucket = bucket + (F.col(dim) > F.lit(c)).cast("int")
    return F.coalesce(bucket, F.lit(0))


def _ntile5_from_offsets(
    df: DataFrame, dim: str, sizes: dict[int, int], out: str
) -> DataFrame:
    """Exact NTILE(5) over ORDER BY (dim, user_id) without a global sort.

    Classic distributed ranking: rows are already coarse-bucketed in
    column `_b_{out}`; `sizes` (bucket -> row count, computed in one
    shared agg by the caller) becomes cumulative offsets, and
    global_rank = offset[bucket] + row_number() within the bucket. The
    window partitions by bucket, so the plan has a parallel hash
    exchange + per-bucket sort — never an `Exchange SinglePartition`
    (pinned by tests/test_plans.py::test_rfm_has_no_single_partition_
    sort). NTILE's tie behavior is preserved exactly because
    (dim, user_id) is a unique composite key and the bucketing is a
    coarsening of it."""
    bcol = f"_b_{out}"
    n = sum(sizes.values())
    offsets, acc = {}, 0
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    off_map = F.create_map(
        [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    lw = Window.partitionBy(bcol).orderBy(dim, "user_id")
    rk = (F.row_number().over(lw) + off_map[F.col(bcol)]).cast("bigint")
    # exact NTILE(5) from the unique global rank: the first n%5 bins
    # hold n//5+1 rows, the rest n//5; integer `div` keeps the bin
    # arithmetic exact at any rank (float floor is off-by-one-prone)
    q, r = n // 5, n % 5
    first = r * (q + 1)
    tile = F.expr(
        f"CASE WHEN _rk_{out} <= {first}"
        f" THEN (_rk_{out} + {q}) div {q + 1}"
        f" ELSE {r} + (_rk_{out} - {first} + {max(q, 1) - 1})"
        f" div {max(q, 1)} END"
    )
    return (
        df.withColumn(f"_rk_{out}", rk)
        .withColumn(out, tile.cast("bigint"))
        .drop(bcol, f"_rk_{out}")
    )


@query("win_rfm_score", oracle=_RFM_ORACLE)
def win_rfm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary — the classic
    customer-value scoring marketing and risk teams run): per-user
    aggregates quintile-binned, user_id tiebreaks making every bin
    assignment deterministic (an un-tiebroken ntile is ungradable —
    ties straddle bin boundaries arbitrarily).

    Scale shape: one partial-agg groupBy collapses events to one row
    per user; each score is then EXACT NTILE(5) computed by cut-point
    bucketing — ONE agg computes all three approx-percentile cut-point
    arrays, the cuts become broadcast literals, rows bucket map-side,
    and a per-bucket window turns bucket offsets + local row_number
    into exact global ranks (see _ntile5_from_offsets). Zero
    single-partition sort exchanges anywhere: at 100 TB the old
    three-ntile formulation funnels the whole users relation through
    one reducer three times; this plan's sorts are all per-bucket."""
    ev = load(spark, sf_dir, "events")
    # localCheckpoint: the users-sized base feeds 3 driver-side bounded
    # artifacts (cuts, bucket counts) plus the final plan — materialize
    # it once instead of re-collapsing events per job
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_timestamp("ts")).alias("last_seen"),
            F.count("*").alias("frequency"),
            F.sum(
                cents(F.col("value"))
            ).alias("monetary_cents"),
        )
        .localCheckpoint(eager=True)
    )
    fr = [i / (RFM_CUTS + 1) for i in range(1, RFM_CUTS + 1)]
    # one agg computes all three cut-point arrays in one pass over the
    # users-sized relation (bounded collect: 1 row)
    cuts_row = base.agg(
        F.percentile_approx("last_seen", fr).alias("r_cuts"),
        F.percentile_approx("frequency", fr).alias("f_cuts"),
        F.percentile_approx("monetary_cents", fr).alias("m_cuts"),
    ).collect()[0]
    dims = [
        ("last_seen", cuts_row["r_cuts"], "r_score"),
        ("frequency", cuts_row["f_cuts"], "f_score"),
        ("monetary_cents", cuts_row["m_cuts"], "m_score"),
    ]
    bucketed = base
    for dim, cuts, out in dims:
        bucketed = bucketed.withColumn(f"_b_{out}", _bucket_expr(dim, cuts))
    # ONE shared job counts every (dimension, bucket) pair — explode to
    # tagged pairs, partial-agg groupBy; bounded collect (<= 3*(CUTS+1))
    pairs = bucketed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(out).alias("tag"),
                        F.col(f"_b_{out}").alias("bucket"),
                    )
                    for _, _, out in dims
                ]
            )
        ).alias("p")
    ).select("p.tag", "p.bucket")
    counts = pairs.groupBy("tag", "bucket").agg(F.count("*").alias("cnt"))
    sizes: dict[str, dict[int, int]] = {out: {} for _, _, out in dims}
    for row in counts.collect():
        sizes[row["tag"]][row["bucket"]] = row["cnt"]
    scored = bucketed
    for dim, _, out in dims:
        scored = _ntile5_from_offsets(scored, dim, sizes[out], out)
    return scored.select(
        "user_id",
        "r_score",
        "f_score",
        "m_score",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary_cents").cast("bigint").alias("monetary_cents"),
    )
