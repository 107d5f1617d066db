"""Measured scale audit: time queries at sf0.01 and sf0.1 and print
the docs/SCALE.md table rows.

Protocol (matches the round-9..12 audits in docs/SCALE.md): one warm
pass per query at BOTH scales first (JVM/codegen warm-up), then
min-of-3 timed passes per SF on a `local[8]` session.  Run on a quiet
host — the point is the sf0.01→sf0.1 growth RATIO under 10× data, so
contention noise on either side corrupts the story.

Usage:
    python scripts/scale_audit.py --wave r18            # one staged wave
    python scripts/scale_audit.py q_hapax_share ...     # specific names
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    names: list[str] = []
    pool: dict = {}
    from clickbom_spark.queries import REGISTRY

    pool.update(REGISTRY)
    if args and args[0] == "--wave":
        wave = args[1]
        m = importlib.import_module(f"clickbom_spark.queries.staged_{wave}")
        wave_q = getattr(m, f"STAGED_{wave.upper()}")
        pool.update(wave_q)
        names = sorted(wave_q)
    else:
        for mod in sorted(
            f[:-3]
            for f in os.listdir(
                os.path.join(os.path.dirname(__file__), "..",
                             "clickbom_spark", "queries")
            )
            if f.startswith("staged_r") and f.endswith(".py")
        ):
            m = importlib.import_module(f"clickbom_spark.queries.{mod}")
            pool.update(getattr(m, f"STAGED_{mod.split('_')[1].upper()}"))
        names = args
    missing = [n for n in names if n not in pool]
    if missing or not names:
        print(f"unknown or no queries: {missing}")
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("scale-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # warm both scales first so codegen/broadcast caches are hot
        for name in names:
            for sf in SFS:
                pool[name].fn(spark, sf).collect()
        rows = []
        for name in names:
            mins = []
            for sf in SFS:
                best = float("inf")
                for _ in range(3):
                    t0 = time.monotonic()
                    pool[name].fn(spark, sf).collect()
                    best = min(best, time.monotonic() - t0)
                mins.append(best)
            ratio = mins[1] / mins[0] if mins[0] else float("nan")
            rows.append((name, mins[0], mins[1], ratio))
            print(
                f"| {name} | {mins[0]:.3f} | {mins[1]:.3f} "
                f"| {ratio:.2f} |",
                flush=True,
            )
        worst = max(rows, key=lambda r: r[3])
        print(f"\nsteepest: {worst[0]} at {worst[3]:.2f}x under 10x data")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
