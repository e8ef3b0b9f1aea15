#!/usr/bin/env python3
"""Interleaved A/B of any registry key's io.cpu_spread call sites in ONE
session: "old" patches cpu_spread to identity (pre-r21/r22 shape), "new"
leaves it active. Alternating pairs, noop-sink timed, CPU probe before
and after.

Usage: python scripts/ab_spread_toggle.py --key profile_columns [--pairs 5]
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
    ap.add_argument("--key", required=True)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--which",
        default="cpu_spread",
        choices=["cpu_spread", "width_preserving_spread"],
        help="which io helper the 'old' variant neutralizes",
    )
    args = ap.parse_args()

    from fintech_data_lake_as_code_spark import io as io_mod
    from fintech_data_lake_as_code_spark.registry import all_queries
    from fintech_data_lake_as_code_spark.session import get_spark

    spark = get_spark("ab-spread-toggle")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[args.key]

    real_spread = getattr(io_mod, args.which)

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

    # every operator module that imported cpu_spread by name needs the
    # patch applied to ITS namespace too
    import fintech_data_lake_as_code_spark.operators as ops_pkg
    import importlib
    import pkgutil

    op_mods = [
        importlib.import_module(f"{ops_pkg.__name__}.{m.name}")
        for m in pkgutil.iter_modules(ops_pkg.__path__)
    ]

    def set_spread(active: bool):
        f = real_spread if active else (
            lambda df, *k, keep_exchange=False: df
        )
        setattr(io_mod, args.which, f)
        for m in op_mods:
            if hasattr(m, args.which):
                setattr(m, args.which, f)

    def run(variant: str) -> float:
        set_spread(variant == "new")
        try:
            q = fn(spark, args.sf)
            spark.sparkContext.setJobDescription(f"ab {args.key} {variant}")
            t0 = time.perf_counter()
            q.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            set_spread(True)

    run("old"); run("new")  # warm-up
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
    rats = sorted(p[1] / p[0] for p in pairs)
    print(f"medians: old {olds[len(olds)//2]:.3f} "
          f"new {news[len(news)//2]:.3f}  "
          f"median-of-ratios {rats[len(rats)//2]:.2f}  "
          f"probe pre {pre:.3f} post {post:.3f} (ref 0.18)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
