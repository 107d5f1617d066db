"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's declared query
surface from :mod:`clickbom_spark.queries` — one entry per implemented
operator family from SURVEY.md §2 (plus the training-data extension
ops).  Column aliases match between the Spark side and the DuckDB
oracle side by construction (see clickbom_spark/queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickbom_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _status_rank() -> dict[str, int]:
    """Per-query verification status from committed CORRECTNESS_r*.json.

    The driver walks ``queries()`` in insertion order under a count
    budget, so order queries that still need a green row (erroring or
    hash-failed first, then never-checked) ahead of the already-green
    wave.  Latest round wins per query.
    """
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                status.update(json.load(f))
        except (OSError, ValueError):
            continue
    ranks = {}
    for name in REGISTRY:
        e = status.get(name)
        if e is None:
            ranks[name] = 1  # never checked
        elif e.get("err") or e.get("hash_match") is not True:
            ranks[name] = 0  # erred / mismatched: re-verify first
        else:
            ranks[name] = 2  # green: re-verify last
    return ranks


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    rank = _status_rank()
    ordered = sorted(REGISTRY, key=lambda n: rank[n])
    return {name: REGISTRY[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
