#!/usr/bin/env python3
"""Dress-rehearse the driver's correctness gate: run the grading prefix
(the first N registry keys, the exact set CORRECTNESS_r{N}.json will
grade) against the DuckDB oracles in a DRIVER-STYLE session — fresh
plain SparkSession, hostile non-UTC timezone, none of the engine's own
configs — so a key that only passes under pytest's warmed session fails
HERE, before the round ends.

Usage:
    python scripts/rehearse_prefix.py [--sf /root/testdata/sf0.01]
                                      [--start 0] [--count 50]

Exit 0 iff every key in the window compares clean. Split long windows
across two invocations (--start 0/--count 25, --start 25/--count 25)
when a single JVM session would crowd a command timeout.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=50)
    ap.add_argument(
        "--tz",
        default="Asia/Kolkata",
        help="hostile session timezone (the driver may run anywhere)",
    )
    ap.add_argument(
        "--keys",
        default=None,
        help="comma-separated registry keys to rehearse instead of a "
        "--start/--count window (changed-key spot checks)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", args.tz)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from fintech_data_lake_as_code_spark.plans.oracle_check import compare

    qs, oracles = e.queries(), e.oracle_sql()
    if args.keys is not None:
        window = [k.strip() for k in args.keys.split(",") if k.strip()]
        unknown = [k for k in window if k not in qs]
        if unknown or not window:
            # same loud-failure stance as the empty window below
            ap.error(
                f"--keys selects nothing usable: unknown={unknown}"
                if window
                else "--keys is empty"
            )
    else:
        window = list(qs)[args.start : args.start + args.count]
    if not window:
        # a mistyped --start/--count would otherwise print "0/0 ok" and
        # exit 0 — a silently-passing empty rehearsal is worse than none
        ap.error(
            f"empty rehearsal window: --start {args.start} --count "
            f"{args.count} selects nothing from {len(qs)} registered keys"
        )
    fails = 0
    for key in window:
        try:
            res = compare(key, qs[key](spark, args.sf), oracles[key], args.sf)
            ok = res.ok
        except Exception as ex:  # noqa: BLE001 — report and keep going
            res, ok = f"EXC {type(ex).__name__}: {str(ex)[:160]}", False
        sys.stdout.write(f"\n{'ok  ' if ok else 'FAIL'} {key}: {res}\n")
        sys.stdout.flush()
        fails += 0 if ok else 1
    label = (
        f"keys[{','.join(window)}]"
        if args.keys is not None
        else f"keys[{args.start}:{args.start + len(window)}]"
    )
    sys.stdout.write(
        f"\nREHEARSAL {label} "
        f"at {args.sf} tz={args.tz}: {len(window) - fails}/{len(window)} ok\n"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
