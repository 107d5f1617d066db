#!/usr/bin/env python
"""Capture .explain("formatted") for headline (bench=True) queries.

Usage: python scripts/capture_plans.py <outdir-suffix> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each query (default: all
bench-flagged queries).  Plan capture only analyzes/optimizes — it does
not execute — except for queries whose fn() has eager side effects
(lake/stream queries), where the returned DataFrame's plan reflects the
final serving query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickbom_spark.queries import REGISTRY  # noqa: E402
from clickbom_spark.session import get_spark  # noqa: E402

# fn() bodies with eager side effects (lake commits, streaming runs):
# capturing their plan still works but executes the pipeline; keep them
# last so a ctrl-C mid-run still captures the cheap ones.
EAGER = {"q_lake_stream_serving"}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, s in REGISTRY.items() if s.bench]
    names = sorted(names, key=lambda n: n in EAGER)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15")
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
