#!/usr/bin/env python
"""Benchmark harness: run the headline queries and print one JSON line.

Usage: python bench.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickbom_spark.queries import REGISTRY  # noqa: E402
from clickbom_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("clickbom-bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in REGISTRY.items() if s.bench}
    # Warm the JVM (whole-stage codegen JIT) + file listing with one
    # full collect per query, so timings measure steady-state execution.
    for spec in headline.values():
        spec.fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(headline.items()):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
