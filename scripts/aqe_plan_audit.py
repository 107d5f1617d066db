"""AQE final-plan audit for the TPC-H dimension-join bench queries.

The r4 bench drifted q3/q5/q18 up 4-14% after the hard-broadcast strip;
the judge asked to confirm AQE still picks broadcast joins for the
dimension sides at sf0.1 (i.e. the drift is machine-load noise, not a
join-strategy regression).  This executes each query at the bench SF,
finalizes the adaptive plan, and reports the join operators chosen.

Usage: python scripts/aqe_plan_audit.py [query ...]   (default: the
dimension-join set)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_nation_year_profit",
    "q10_returned_item_customers",
    "q18_large_orders",
]


def main() -> int:
    from clickbom_spark.queries import REGISTRY
    from clickbom_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("aqe-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.collect()  # finalize the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {
            op: len(re.findall(rf"(?m)^[\s+:*-]*{op}\b", plan))
            for op in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
        }
        print(f"{name}: { {k: v for k, v in counts.items() if v} }")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
