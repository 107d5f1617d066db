"""Sequence packing: greedy fill of token-capped training sequences.

LLM pretraining consumes fixed-length sequences; packing multiple short
documents into one sequence (instead of padding each) is a standard
throughput multiplier.  The operator assigns every document a
``pack_id`` such that consecutive documents (in a deterministic shard
order) share a pack until adding the next document would exceed the
token cap; a document longer than the cap gets a pack of its own.

Scale design (100 TB):

- Packing is inherently sequential *within* an ordered stream, so the
  parallel unit is the SHARD: documents are grouped by shard columns
  (e.g. ``lang, source`` — in production add a hash-bucket column to
  bound shard size) and each shard packs independently inside one
  ``applyInPandas`` group.  State per shard is O(1): a running token
  count and a pack counter.  No global order, no driver involvement.
- The greedy first-fit-in-order policy is deterministic given the shard
  order column, so reruns produce identical pack assignments — required
  for resumable pipelines and for the DuckDB oracle (a recursive CTE
  replaying the same fold) to match bit-for-bit.
- Arrow batches carry only (shard cols, order col, token count) — the
  text itself never enters the Python worker.

Reference analog: the reference engine has no packing operator (it is
an SBOM/warehouse pipeline); this is part of the training-data
extension surface (SURVEY.md §2 north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    docs: DataFrame,
    cap: int,
    shard_cols: list[str],
    order_col: str,
    tokens_col: str,
) -> DataFrame:
    """Assign ``pack_id`` (1-based per shard) to each document.

    Greedy in ``order_col`` order within each shard: a new pack starts
    when the running token sum would exceed ``cap``.  Returns the input
    columns plus ``pack_id`` (long).
    """
    import pandas as pd

    out_schema = T.StructType(
        [docs.schema[c] for c in shard_cols]
        + [docs.schema[order_col], docs.schema[tokens_col]]
        + [T.StructField("pack_id", T.LongType())]
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        run = 0
        pack = 0
        ids = []
        for t in pdf[tokens_col].tolist():
            if pack == 0 or run + t > cap:
                pack += 1
                run = t
            else:
                run += t
            ids.append(pack)
        pdf["pack_id"] = ids
        return pdf[[c.name for c in out_schema.fields]]

    slim = docs.select(*shard_cols, order_col, tokens_col)
    return slim.groupBy(*shard_cols).applyInPandas(_pack, out_schema)
