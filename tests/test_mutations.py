"""Copy-on-write mutation laws: correctness of the final table state,
and file-level pruning — unaffected files must be byte-identical."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from clickbom_spark.ext.mutations import cow_delete, cow_update, cow_upsert


def _file_hashes(path):
    out = {}
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        if os.path.isfile(p) and not name.startswith(("_", ".")):
            out[name] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def _lake(spark, tmp_path):
    """A small lake where key ranges map to files, so a selective
    predicate affects a strict subset of files."""
    path = str(tmp_path / "lake")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).cast("double").alias("val"),
    )
    # range-partition on id so file min/max stats are tight per file
    df.repartitionByRange(8, "id").write.parquet(path)
    return path


def test_cow_update_state_and_pruning(spark, tmp_path):
    path = _lake(spark, tmp_path)
    before = _file_hashes(path)
    pred = (F.col("id") >= 100) & (F.col("id") < 150)
    stats = cow_update(
        spark, path, pred, {"val": F.col("val") + 1000.0}
    ).collect()[0]
    assert stats["n_rows_updated"] == 50
    assert 1 <= stats["n_files_rewritten"] < stats["n_files_total"]

    after = _file_hashes(path)
    untouched_before = {
        n: h
        for n, h in before.items()
        if n in after and after[n] == h
    }
    # pruning: at least one original file survived byte-identical
    assert untouched_before, (before, after)

    got = {
        r["id"]: r["val"]
        for r in spark.read.parquet(path).collect()
    }
    assert len(got) == 1000
    for i in range(1000):
        expect = i * 2.0 + (1000.0 if 100 <= i < 150 else 0.0)
        assert got[i] == expect, i


def test_cow_delete_state_and_pruning(spark, tmp_path):
    path = _lake(spark, tmp_path)
    before = _file_hashes(path)
    stats = cow_delete(spark, path, F.col("id") < 125).collect()[0]
    assert stats["n_rows_deleted"] == 125
    assert stats["n_files_rewritten"] < stats["n_files_total"]
    after = _file_hashes(path)
    assert any(n in after and after[n] == h for n, h in before.items())
    remaining = spark.read.parquet(path)
    assert remaining.count() == 875
    assert remaining.agg(F.min("id")).collect()[0][0] == 125


def test_cow_update_noop_predicate_rewrites_nothing(spark, tmp_path):
    path = _lake(spark, tmp_path)
    before = _file_hashes(path)
    stats = cow_update(
        spark, path, F.col("id") > 10_000, {"val": F.lit(0.0)}
    ).collect()[0]
    assert stats["n_files_rewritten"] == 0
    assert stats["n_rows_updated"] == 0
    assert _file_hashes(path) == before


def test_cow_upsert_merge_semantics_pruning_and_idempotence(spark, tmp_path):
    import pytest

    path = _lake(spark, tmp_path)
    before = _file_hashes(path)
    # updates hit a narrow id range (subset of files); plus pure inserts
    changes = spark.createDataFrame(
        [(i, i % 7, -1.0) for i in range(200, 220)]
        + [(5000 + i, 0, 99.0) for i in range(5)],
        "id long, grp long, val double",
    )
    stats = cow_upsert(spark, path, changes, ["id"]).collect()[0]
    assert stats["n_matched"] == 20
    assert stats["n_inserted"] == 5
    assert 1 <= stats["n_files_rewritten"] < 8

    after = _file_hashes(path)
    assert any(n in after and after[n] == h for n, h in before.items())

    got = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 1005
    for i in range(1000):
        assert got[i] == (-1.0 if 200 <= i < 220 else i * 2.0), i
    for i in range(5):
        assert got[5000 + i] == 99.0

    # idempotence: replaying the same change set leaves the state fixed
    cow_upsert(spark, path, changes, ["id"])
    got2 = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert got2 == got

    # duplicate change keys are rejected, not silently merged
    dup = spark.createDataFrame(
        [(1, 0, 1.0), (1, 0, 2.0)], "id long, grp long, val double"
    )
    with pytest.raises(ValueError, match="multiple change rows"):
        cow_upsert(spark, path, dup, ["id"])


def test_cow_upsert_pure_inserts_without_matches(spark, tmp_path):
    path = _lake(spark, tmp_path)
    before = _file_hashes(path)
    inserts = spark.createDataFrame(
        [(9000, 1, 7.0)], "id long, grp long, val double"
    )
    stats = cow_upsert(spark, path, inserts, ["id"]).collect()[0]
    assert stats["n_files_rewritten"] == 0
    assert stats["n_inserted"] == 1
    after = _file_hashes(path)
    assert all(after[n] == h for n, h in before.items())  # nothing rewritten
    assert spark.read.parquet(path).count() == 1001
