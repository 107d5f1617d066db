"""Copy-on-write mutations over a parquet lake directory — the
UPDATE / DELETE primitive of a table format (Delta/Iceberg style),
expressed with plain Spark + parquet:

1. **Probe** — one scan tagging rows with ``input_file_name`` finds the
   files that contain matching rows.  The predicate reaches the parquet
   reader (PushedFilters), so row-group zone maps skip non-matching
   files' data — the probe reads close to nothing for selective
   predicates.
2. **Rewrite** — ONLY the affected files are re-read; matching rows get
   the assignments applied (or dropped, for DELETE); results land as
   new part files beside the untouched ones, then the old affected
   files are removed.  Unaffected files are never rewritten —
   byte-identical before and after (pinned by test).

What a real table format adds on top is the commit protocol (manifest
swap for atomic multi-file publish, snapshot isolation, time travel).
This operator keeps the data-path mechanics — probe, prune, rewrite
subset, swap — and documents that boundary honestly: the swap here is
per-file ``os.replace``/unlink, atomic per file but not across files.

At 100 TB: the probe is a predicate-pushed scan (zone-map-skipped);
the rewrite touches |affected files| only, as distributed tasks; the
driver holds just the affected-file NAME list (the same "summary is
the model" budget as the BPE rule list).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _affected_files(
    spark: SparkSession, path: str, predicate: Column
) -> tuple[list[str], int]:
    """File paths containing predicate-matching rows, and the match
    count — one predicate-pushed scan."""
    df = spark.read.parquet(path)
    rows = (
        df.where(predicate)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    files = [r["f"].replace("file://", "").replace("file:", "") for r in rows]
    return files, sum(r["n"] for r in rows)


def _rewrite(
    spark: SparkSession,
    path: str,
    files: list[str],
    transform,
) -> None:
    """Re-read only ``files``, apply ``transform`` (DataFrame →
    DataFrame), write the results as new part files in ``path``, then
    unlink the originals."""
    if not files:
        return
    sub = spark.read.parquet(*files)
    out = transform(sub)
    tmp = os.path.join(path, f"_cow_tmp_{uuid.uuid4().hex[:12]}")
    out.write.parquet(tmp)
    for f in files:
        os.unlink(f)
    for name in os.listdir(tmp):
        src = os.path.join(tmp, name)
        if name.startswith("part-") and os.path.isfile(src):
            os.replace(
                src,
                os.path.join(path, f"cow-{uuid.uuid4().hex[:12]}-{name}"),
            )
        elif os.path.isfile(src):
            os.unlink(src)
    os.rmdir(tmp)


def cow_update(
    spark: SparkSession,
    path: str,
    predicate: Column,
    assignments: dict[str, Column],
) -> DataFrame:
    """UPDATE <path> SET <assignments> WHERE <predicate>, copy-on-write.

    Returns one row (n_files_total, n_files_rewritten, n_rows_updated).
    """
    n_total = len(
        [f for f in os.listdir(path) if f.endswith(".parquet") or f.startswith(("part-", "cow-"))]
    )
    files, n_rows = _affected_files(spark, path, predicate)

    def transform(sub: DataFrame) -> DataFrame:
        out = sub
        for col, expr in assignments.items():
            out = out.withColumn(
                col, F.when(predicate, expr).otherwise(F.col(col))
            )
        return out

    _rewrite(spark, path, files, transform)
    return spark.createDataFrame(
        [(n_total, len(files), n_rows)],
        "n_files_total long, n_files_rewritten long, n_rows_updated long",
    )


def cow_delete(
    spark: SparkSession, path: str, predicate: Column
) -> DataFrame:
    """DELETE FROM <path> WHERE <predicate>, copy-on-write.

    Returns one row (n_files_total, n_files_rewritten, n_rows_deleted).
    """
    n_total = len(
        [f for f in os.listdir(path) if f.endswith(".parquet") or f.startswith(("part-", "cow-"))]
    )
    files, n_rows = _affected_files(spark, path, predicate)
    _rewrite(spark, path, files, lambda sub: sub.where(~predicate))
    return spark.createDataFrame(
        [(n_total, len(files), n_rows)],
        "n_files_total long, n_files_rewritten long, n_rows_deleted long",
    )


def cow_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """MERGE INTO <path> USING <changes> ON <key_cols> — WHEN MATCHED
    replace the row, WHEN NOT MATCHED insert it (the upsert core of a
    table format's MERGE), copy-on-write.

    Probe: lake rows semi-joined against the (broadcast) change keys,
    grouped by ``input_file_name`` — any file holding a matched key is
    affected.  Rewrite: affected files minus matched rows, plus ALL
    change rows (a change row either replaces a row that lived in an
    affected file — no other file can hold its key — or is a pure
    insert).  Unaffected files are untouched; pure inserts with no
    affected file land as a fresh part file.

    ``changes`` must carry the lake schema, with at most one row per
    key (enforced — violating rows would make MERGE nondeterministic,
    the same constraint Delta raises).  Returns one row
    (n_files_rewritten, n_matched, n_inserted).
    """
    keys = changes.select(*key_cols).groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n")
    )
    dup = keys.where(F.col("_n") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"cow_upsert: multiple change rows share key {tuple(dup[0])[:-1]}"
        )
    key_frame = keys.drop("_n")

    lake = spark.read.parquet(path)
    # tag the file BEFORE the join: input_file_name() is per-source and
    # unresolvable once a second (possibly file-backed) source joins in
    probe = (
        lake.withColumn("_f", F.input_file_name())
        .join(F.broadcast(key_frame), key_cols, "left_semi")
        .groupBy(F.col("_f").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    files = [r["f"].replace("file://", "").replace("file:", "") for r in probe]
    n_matched = sum(r["n"] for r in probe)
    n_changes = changes.count()

    cols = lake.columns
    if files:
        _rewrite(
            spark,
            path,
            files,
            lambda sub: sub.join(
                F.broadcast(key_frame), key_cols, "left_anti"
            )
            .select(*cols)
            .unionByName(changes.select(*cols)),
        )
    else:
        tmpname = f"cow-{uuid.uuid4().hex[:12]}"
        tmp = os.path.join(path, f"_cow_tmp_{uuid.uuid4().hex[:12]}")
        changes.select(*cols).write.parquet(tmp)
        for name in os.listdir(tmp):
            src = os.path.join(tmp, name)
            if name.startswith("part-") and os.path.isfile(src):
                os.replace(src, os.path.join(path, f"{tmpname}-{name}"))
            elif os.path.isfile(src):
                os.unlink(src)
        os.rmdir(tmp)
    return spark.createDataFrame(
        [(len(files), n_matched, n_changes - n_matched)],
        "n_files_rewritten long, n_matched long, n_inserted long",
    )
