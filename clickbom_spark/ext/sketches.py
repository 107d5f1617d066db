"""Frequency-sketch operators: Misra–Gries heavy hitters.

The ClickHouse ``topK()`` analog, Spark-shaped as the classic 2-pass
scheme:

1. **Candidate pass** — a per-partition Misra–Gries summary of size
   ``k`` (Misra & Gries 1982; the `space-saving` family ClickHouse's
   topK implements).  MG's guarantee: any item with partition frequency
   > n_p/k survives that partition's summary; by pigeonhole, an item
   with GLOBAL frequency > N/k must exceed n_p/k in at least one
   partition, so the union of per-partition candidates is a SUPERSET
   of the true heavy hitters — completeness is structural, not
   probabilistic.
2. **Recount pass** — exact counts for the (tiny) candidate set via a
   broadcast semi-join + hash aggregate, then the > N/k cutoff.

The sketch runs in ``mapInPandas`` (Arrow batches, one dict of ≤2k
counters per partition — the iterator spans the partition, so state
carries across batches); everything after it is built-in expressions.
Output is EXACT: same rows as a full groupBy-count with the same
cutoff, at a fraction of the shuffle (candidates only, never the full
key cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    """mapInPandas kernel: one Misra–Gries summary per partition."""

    def run(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def heavy_hitters(
    df: DataFrame, col: str, k: int = 16
) -> DataFrame:
    """Exact items with frequency > N/k (N = non-null row count).

    Returns (``col``, cnt, n_total) — identical to the full
    groupBy-count answer at the same cutoff (completeness from the MG
    pigeonhole bound, exactness from the recount), but the aggregate
    shuffles only the candidate subset.  Deterministic: the output set
    is a property of the data, not of partitioning (candidates are a
    superset under ANY partitioning; the recount+cutoff trims it to
    the same final set).
    """
    src = df.select(F.col(col).alias(col)).where(F.col(col).isNotNull())
    schema = src.schema
    cands = (
        src.mapInPandas(_mg_partition(k, col), schema=schema)
        .distinct()
    )
    counted = (
        src.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = src.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counted.join(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n_total"))
        .select(col, "cnt", "n_total")
    )
