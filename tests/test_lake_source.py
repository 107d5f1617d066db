"""Lake-as-streaming-source laws (streaming/lake_source.py): the
versioned lake consumed through Spark's Python Data Source API —
append commits become micro-batches (executor-side file reads),
checkpointed offsets give exactly-once resumption, and non-append
commits fail fast unless ignoreChanges opts into Delta-style
rewritten-row redelivery."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickbom_spark.ext.manifest import VersionedLake
from clickbom_spark.streaming.lake_source import LakeStreamDataSource

_SCHEMA = "id long, grp long, val double"


def _mk_lake(spark, tmp_path, n=60):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        (F.col("id") * 1.0).alias("val"),
    )
    return VersionedLake.create(spark, str(tmp_path / "slake"), df, n_files=2)


def _drain(spark, path, checkpoint, **opts):
    spark.dataSource.register(LakeStreamDataSource)
    reader = spark.readStream.format("lake_stream").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    got: list[tuple] = []

    def sink(batch_df, epoch_id):
        got.extend(
            (r["id"], r["grp"], r["val"]) for r in batch_df.collect()
        )

    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return got


def test_append_commits_stream_exactly_once(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    # two append commits (upserts with entirely fresh keys rewrite no
    # existing file — the append-only shape)
    lake.upsert(
        spark.createDataFrame([(100, 0, 1.0), (101, 1, 2.0)], _SCHEMA),
        ["id"],
    )
    lake.upsert(spark.createDataFrame([(102, 2, 3.0)], _SCHEMA), ["id"])

    ckpt = str(tmp_path / "ck1")
    got = _drain(spark, lake.path, ckpt)
    want = {(r["id"], r["grp"], r["val"]) for r in lake.read().collect()}
    assert set(got) == want and len(got) == len(want) == 63

    # resume from the SAME checkpoint: only the new commit's rows
    lake.upsert(spark.createDataFrame([(103, 0, 4.0)], _SCHEMA), ["id"])
    got2 = _drain(spark, lake.path, ckpt)
    assert set(got2) == {(103, 0, 4.0)}

    # a fresh checkpoint replays everything exactly once
    got3 = _drain(spark, lake.path, str(tmp_path / "ck2"))
    assert len(got3) == 64
    assert set(got3) == {
        (r["id"], r["grp"], r["val"]) for r in lake.read().collect()
    }


def test_non_append_commit_fails_fast_unless_ignore_changes(
    spark, tmp_path
):
    lake = _mk_lake(spark, tmp_path)
    ckpt = str(tmp_path / "ckA")
    assert len(_drain(spark, lake.path, ckpt)) == 60
    # a COW update removes files -> not expressible as an append stream
    lake.update(F.col("id") < 5, {"val": F.lit(-1.0)})
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append"):
        _drain(spark, lake.path, ckpt)
    # ignoreChanges: rewritten files' rows are redelivered (Delta's
    # documented semantics — per-key idempotence is downstream's job)
    got = _drain(spark, lake.path, ckpt, ignoreChanges="true")
    ids = {t[0] for t in got}
    assert {0, 1, 2, 3, 4} <= ids  # the rewritten rows reappear
    assert all(t[2] == -1.0 for t in got if t[0] < 5)


def test_starting_version_skips_history(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    lake.upsert(spark.createDataFrame([(200, 0, 9.0)], _SCHEMA), ["id"])
    got = _drain(
        spark, lake.path, str(tmp_path / "ckB"), startingVersion="1"
    )
    assert set(got) == {(200, 0, 9.0)}


def test_stream_speaks_logical_schema_across_evolution(spark, tmp_path):
    """Schema evolution mid-stream: rename + add_column are
    metadata-only commits (no files removed, so the append contract
    holds); the stream serves the LOGICAL schema for every physical
    generation — old files resolve through the rename chain, pre-add
    files fill the manifest default."""
    from clickbom_spark.ext.manifest import add_column, rename_column

    lake = _mk_lake(spark, tmp_path, n=20)
    rename_column(lake, "val", "amount")
    add_column(lake, "quality", 0.5)
    # post-evolution append physically carries the new schema
    lake.upsert(
        spark.createDataFrame(
            [(100, 0, 9.0, 0.9)],
            "id long, grp long, amount double, quality double",
        ),
        ["id"],
    )
    spark.dataSource.register(LakeStreamDataSource)
    got = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            got[r["id"]] = (r["amount"], r["quality"])

    q = (
        spark.readStream.format("lake_stream")
        .option("path", lake.path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cke"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(got) == 21
    assert got[3] == (3.0, 0.5)     # old generation: renamed + default
    assert got[100] == (9.0, 0.9)   # new generation: physical values


def test_resume_after_vacuum_past_offset_raises_data_loss(
    spark, tmp_path
):
    """Exactly-once means a checkpointed stream must NOT silently
    clamp to the earliest surviving snapshot when the lake was
    vacuumed past its consumed offset — clamping would re-deliver the
    snapshot's FULL file list (rows already consumed).  Delta's
    failOnDataLoss behavior: the resume fails; only a FRESH
    checkpoint gets the initial-snapshot clamp."""
    lake = _mk_lake(spark, tmp_path, n=30)
    ckpt = str(tmp_path / "ckdl")
    assert len(_drain(spark, lake.path, ckpt)) == 30  # consumed v0
    lake.upsert(spark.createDataFrame([(200, 1, 2.0)], _SCHEMA), ["id"])
    lake.upsert(spark.createDataFrame([(201, 2, 3.0)], _SCHEMA), ["id"])
    lake.vacuum(keep_last=1)  # earliest surviving manifest is now v2
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    with pytest.raises(StreamingQueryException, match="vacuumed past"):
        _drain(spark, lake.path, ckpt)
    # a fresh checkpoint still gets the documented clamp
    got = _drain(spark, lake.path, str(tmp_path / "ckdl2"))
    assert len(got) == 32


@pytest.mark.slow
def test_backfill_scale_per_file_partitions_and_restart(
    spark, tmp_path
):
    """Backfill shape at scale: >=100 files consumed across >=3
    micro-batches; the driver plans one InputPartition PER FILE from
    manifest metadata alone (no row data driver-side), and a
    checkpoint restart mid-backfill resumes exactly-once."""
    df = spark.range(400).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        (F.col("id") * 1.0).alias("val"),
    ).repartition(40)
    lake = VersionedLake.create(
        spark, str(tmp_path / "biglake"), df, n_files=40
    )
    # first leg of the backfill: v0 only, under a checkpoint
    ckpt = str(tmp_path / "ckbig")
    got1 = _drain(spark, lake.path, ckpt)
    assert len(got1) == 400

    for lo in (400, 800):  # two more append commits, 40 files each
        batch = spark.range(lo, lo + 400).select(
            F.col("id"), (F.col("id") % 3).alias("grp"),
            (F.col("id") * 1.0).alias("val"),
        ).repartition(40)
        lake.upsert(batch, ["id"])

    # (a) partition planning is per-file and metadata-only: the
    # driver-side reader turns a version range into file-path
    # partitions without touching row data
    from clickbom_spark.streaming.lake_source import LakeStreamReader

    reader = LakeStreamReader({"path": lake.path})
    parts = reader.partitions({"version": -1}, {"version": 0})
    assert len(parts) == 40
    assert all(
        isinstance(p.file_path, str) and p.file_path.endswith(".parquet")
        for p in parts
    )
    full = reader.partitions({"version": -1}, {"version": 2})
    assert len(full) == 120  # one partition per file across the range

    # (b) restart mid-backfill: resuming the SAME checkpoint delivers
    # exactly the files added after the consumed offset — union is
    # exactly the lake, no row delivered twice
    got2 = _drain(spark, lake.path, ckpt)
    assert len(got2) == 800
    seen = got1 + got2
    assert len(seen) == len(set(seen)) == 1200
    assert {t[0] for t in seen} == set(range(1200))


def test_stream_over_vacuumed_history_starts_at_earliest(spark, tmp_path):
    """Delta's initial-snapshot behavior: after vacuum(keep_last=1), a
    FRESH stream begins at the earliest surviving snapshot (its full
    file list is the first batch) instead of crashing on the missing
    v0 manifest."""
    lake = _mk_lake(spark, tmp_path, n=30)
    lake.upsert(spark.createDataFrame([(200, 1, 2.0)], _SCHEMA), ["id"])
    lake.vacuum(keep_last=1)
    got = _drain(spark, lake.path, str(tmp_path / "ckv"))
    assert len(got) == 31
    assert {t[0] for t in got} == set(range(30)) | {200}
