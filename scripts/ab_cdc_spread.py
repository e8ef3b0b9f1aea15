#!/usr/bin/env python3
"""Interleaved A/B of cdc_incremental_agg's gated user_id spread
(r22 change 3) inside ONE session: old (bare load) vs new
(cpu_spread(load, user_id)), alternating, noop-sink timed, with CPU/
shuffle probes before and after so the box state is recorded.

Usage: python scripts/ab_cdc_spread.py [--pairs 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from fintech_data_lake_as_code_spark.io import cpu_spread, load
    from fintech_data_lake_as_code_spark.operators.cdc import incremental_agg
    from fintech_data_lake_as_code_spark.session import get_spark

    spark = get_spark("ab-cdc-spread")
    spark.sparkContext.setLogLevel("ERROR")

    def probe():
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).selectExpr(
                "sum(id + 1) as a", "sum(id * 2) as b"
            ).collect()
            t.append(time.perf_counter() - t0)
        t.sort()
        return t[1]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run(variant: str) -> float:
        ev = load(spark, args.sf, "events")
        if variant == "new":
            ev = cpu_spread(ev, "user_id")
        q = incremental_agg(ev)
        spark.sparkContext.setJobDescription(f"ab cdc {variant}")
        t0 = time.perf_counter()
        noop(q)
        return time.perf_counter() - t0

    # warm-up both variants once (JIT, page cache, AQE machinery)
    run("old"); run("new")
    pre = probe()
    pairs = []
    for i in range(args.pairs):
        a = run("old")
        b = run("new")
        pairs.append((a, b))
        print(f"pair {i}: old {a:.3f}  new {b:.3f}  ratio {b/a:.2f}",
              flush=True)
    post = probe()
    olds = sorted(p[0] for p in pairs)
    news = sorted(p[1] for p in pairs)
    mo, mn = olds[len(olds)//2], news[len(news)//2]
    rats = sorted(p[1]/p[0] for p in pairs)
    print(f"medians: old {mo:.3f} new {mn:.3f}  "
          f"median-of-ratios {rats[len(rats)//2]:.2f}  "
          f"probe pre {pre:.3f} post {post:.3f} (ref 0.18)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
