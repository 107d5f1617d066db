"""Copy-on-write mutation laws: correctness of the final table state,
and file-level pruning — unaffected files must be byte-identical."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from clickbom_spark.ext.mutations import cow_delete, cow_update


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
