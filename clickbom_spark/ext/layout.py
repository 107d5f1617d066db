"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

Reference parity: the reference engine relies on its MergeTree sort key
for range pruning on ONE leading dimension (entrypoint.sh `ORDER BY
(name, version, license)` semantics); Z-ordering is the Spark-side
generalization that gives *every* interleaved dimension tight per-file
min/max bounds, so parquet footer statistics prune box queries on any
of them (the mechanism behind Delta Lake's OPTIMIZE ZORDER BY).

100 TB design:
- quantization needs only per-column global min/max — one cheap
  columnar agg, two scalars per column to the driver;
- the z-value itself is a pure bitwise Column expression
  (whole-stage-codegen, no UDF, no shuffle of its own);
- the write is ONE ``repartitionByRange`` on z (a range shuffle with
  sampled boundaries — balanced output files regardless of skew in the
  raw dimensions) + an in-partition sort.  Every output file then owns
  a tight z-interval, hence a bounded box in the interleaved
  dimensions, and scan-time predicate pushdown skips whole files.

The bit arithmetic is plain BIGINT shifts/masks, so it is replicable
verbatim in any SQL engine — which is what makes the z-clustering
query DuckDB-oracle-checkable (see queries/scale_ops.py
q_zorder_cluster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int(col: Column, mn, mx, bits: int) -> Column:
    """Map an integer column into [0, 2**bits) by equi-width bucketing
    over its [mn, mx] range — exact integer arithmetic only
    (``(x - mn) * 2**bits  div  (mx - mn + 1)``, DuckDB ``//``), so
    every engine computes the identical bucket."""
    mn = F.lit(mn) if isinstance(mn, int) else mn
    mx = F.lit(mx) if isinstance(mx, int) else mx
    span = mx.cast("long") - mn.cast("long") + F.lit(1)
    num = (col.cast("long") - mn.cast("long")) * F.lit(1 << bits)
    return F.floor(num / span).cast("long")


def interleave_bits(quantized: list[Column], bits: int) -> Column:
    """Morton z-value: interleave ``bits`` bits from each of the
    quantized dimensions (dimension d contributes bit i at position
    ``i * ndims + d``).  Pure shifts and masks — codegen-friendly and
    SQL-portable."""
    ndims = len(quantized)
    z = F.lit(0).cast("long")
    for d, q in enumerate(quantized):
        for i in range(bits):
            bit = F.shiftright(q.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ndims + d)
    return z


def interleave_bits_sql(quantized: list[str], bits: int) -> str:
    """The same Morton interleave as ANSI/DuckDB SQL text, for oracle
    replication."""
    ndims = len(quantized)
    terms = [
        f"((({q} >> {i}) & 1) << {i * ndims + d})"
        for d, q in enumerate(quantized)
        for i in range(bits)
    ]
    return " + ".join(terms)


def zvalue(
    df: DataFrame,
    cols: list[Column],
    bits: int = 8,
    bounds: list[tuple[int, int]] | None = None,
) -> Column:
    """Z-value over ``cols`` (integer-valued Column expressions).

    ``bounds`` declares each column's (min, max) range from catalog
    statistics; when provided, no job runs at plan-build.  Without it
    the ranges come from ONE min/max agg over ``df`` (an extra full
    pass at 100 TB — production callers should declare)."""
    if bounds is None:
        aggs = []
        for i, c in enumerate(cols):
            aggs += [
                F.min(c.cast("long")).alias(f"mn{i}"),
                F.max(c.cast("long")).alias(f"mx{i}"),
            ]
        s = df.agg(*aggs).first()
        bounds = [(int(s[f"mn{i}"]), int(s[f"mx{i}"])) for i in range(len(cols))]
    q = [
        quantize_int(c, mn, mx, bits)
        for c, (mn, mx) in zip(cols, bounds)
    ]
    return interleave_bits(q, bits)


def write_zordered(
    df: DataFrame,
    cols: list[Column],
    path: str,
    n_files: int = 16,
    bits: int = 8,
    bounds: list[tuple[int, int]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    One range shuffle on the z-value (sampled boundaries → balanced
    files), in-partition sort for tight row-group stats, z column
    dropped from the output.  Downstream scans with predicates on ANY
    of the interleaved dimensions skip files via footer min/max.
    """
    z = zvalue(df, cols, bits, bounds=bounds)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_time_partitioned(
    df: DataFrame,
    ts_col: str,
    path: str,
    fmt: str = "yyyy-MM-dd",
) -> None:
    """Hive-style event-time partitioned layout (``dt=YYYY-MM-DD/``).

    Directory-level partition pruning is the first line of defense at
    100 TB: a one-day predicate on a year of data touches 1/365th of
    the files before any footer is opened.  The ``repartition("dt")``
    shuffle co-locates each day in one task so every partition gets
    ONE output file instead of one-per-input-task (the classic
    small-files failure of naive partitionBy writes).
    """
    from pyspark.sql import functions as F

    (
        df.withColumn("dt", F.date_format(ts_col, fmt))
        .repartition("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def compact_files(
    spark,
    src: str,
    dst: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bin-pack a directory of small files into ``target_files`` parquet
    files, optionally range-clustered on ``sort_cols`` for footer-stats
    skipping — streaming sinks and incremental loads fragment layouts,
    and scan cost at scale is dominated by file count, not bytes.
    """
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst)
