#!/usr/bin/env python3
"""Per-key stage-time attribution (guide §1.1/§7.1 empirical loop,
headless): run each key once warm with a job-description label and a
UI-enabled session, then pull the UI REST API and report, per key, the
completed jobs/stages with their wall durations, task-time totals, and
shuffle read/write bytes — the "where does the time go" answer the
Stages tab would give.

Usage:
    python scripts/stage_attrib.py --keys k1,k2 [--sf /root/testdata/sf0.1]
                                   [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from fintech_data_lake_as_code_spark.registry import all_queries
    from fintech_data_lake_as_code_spark.session import (
        apply_engine_conf,
        default_parallelism,
    )
    from pyspark.sql import SparkSession

    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName("stage-attrib")
        .master(f"local[{cores}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
    )
    spark = apply_engine_conf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm prelude (bench.py's, abbreviated)
    from fintech_data_lake_as_code_spark.io import load
    from pyspark.sql.functions import pandas_udf

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _warm = pandas_udf(lambda s: s, "long")
    spark.range(cores * 4).repartition(cores).select(
        _warm("id").alias("v")
    ).agg({"v": "sum"}).collect()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load(spark, args.sf, t).selectExpr("sum(hash(*))").collect()
    from fintech_data_lake_as_code_spark.operators.scale import _bucketed_table

    _bucketed_table(spark, args.sf, "lineitem", "l_orderkey")
    _bucketed_table(spark, args.sf, "orders", "o_orderkey")
    from fintech_data_lake_as_code_spark.operators.dedup import (
        warm_session_memos,
    )

    warm_session_memos(spark, args.sf)
    from fintech_data_lake_as_code_spark.streaming.queries import (
        _docs_json_dir,
        _events_json_dir,
    )

    _events_json_dir(spark, args.sf)
    _docs_json_dir(spark, args.sf)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def _get(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    sc = spark.sparkContext
    for key in keys:
        # warm run (uncounted), then labeled timed run(s)
        queries[key](spark, args.sf).write.mode("overwrite").format(
            "noop"
        ).save()
        sc.setJobDescription(f"KEY:{key}")
        t0 = time.perf_counter()
        for _ in range(args.reps - 1):
            queries[key](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        jobs = [
            j
            for j in _get("/jobs?status=succeeded")
            if j.get("description", "") == f"KEY:{key}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {s["stageId"]: s for s in _get("/stages?status=complete")}
        print(f"\n=== {key}: wall {wall:.3f}s over {args.reps - 1} rep(s), "
              f"{len(jobs)} jobs, {len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            st = stages.get(sid)
            if st is None:
                continue
            dur = None
            if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                # ISO-ish "2026-08-17T22:40:32.123GMT"
                def _p(t):
                    return time.mktime(
                        time.strptime(t[:19], "%Y-%m-%dT%H:%M:%S")
                    ) + float("0" + t[19:23] or 0)

                try:
                    dur = _p(st["completionTime"]) - _p(
                        st["firstTaskLaunchedTime"]
                    )
                except Exception:
                    dur = None
            rows.append(
                (
                    st.get("executorRunTime", 0),
                    sid,
                    st.get("numCompleteTasks", 0),
                    st.get("shuffleReadBytes", 0),
                    st.get("shuffleWriteBytes", 0),
                    dur,
                    (st.get("description") or st.get("name", ""))[:90],
                )
            )
        rows.sort(reverse=True)
        for run_ms, sid, ntask, srd, swr, dur, name in rows[:14]:
            dtxt = f"{dur:6.2f}s" if dur is not None else "   ?  "
            print(
                f"  stage {sid:>5} run {run_ms/1000.0:7.2f}s wall {dtxt} "
                f"tasks {ntask:>3} shufR {srd/1e6:7.2f}MB "
                f"shufW {swr/1e6:7.2f}MB  {name}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
