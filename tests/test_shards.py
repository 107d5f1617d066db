"""Tar sharding round-trip: bytes survive exactly, shard membership is
preserved, shard files are deterministic, and the budget-sharder
composes end to end."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from clickbom_spark.ext.shards import read_tar_shards, write_tar_shards


def _blobs(n):
    return [
        (i, f"{i:06d}.bin", hashlib.md5(str(i).encode()).digest() * (i % 7 + 1))
        for i in range(n)
    ]


def test_tar_shard_roundtrip_exact_bytes(spark):
    rows = [(i % 5, name, data) for i, name, data in _blobs(40)]
    df = spark.createDataFrame(rows, "shard long, name string, data binary")
    with tempfile.TemporaryDirectory() as tmp:
        write_tar_shards(df, tmp)
        files = sorted(os.listdir(tmp))
        assert files == [f"shard-{s:06d}.tar" for s in range(5)]
        back = read_tar_shards(spark, tmp).collect()
    got = {r["name"]: (r["shard_file"], bytes(r["data"])) for r in back}
    assert len(got) == 40
    for shard, name, data in rows:
        f, d = got[name]
        assert f == f"shard-{shard:06d}.tar"
        assert d == data


def test_tar_shard_bytes_deterministic(spark):
    rows = [(0, name, data) for _i, name, data in _blobs(10)]
    df = spark.createDataFrame(rows, "shard long, name string, data binary")
    digests = []
    for _ in range(2):
        with tempfile.TemporaryDirectory() as tmp:
            # shuffle input order: member sort + fixed metadata must
            # yield identical shard bytes regardless
            write_tar_shards(df.orderBy(F.rand(seed=len(digests))), tmp)
            with open(os.path.join(tmp, "shard-000000.tar"), "rb") as f:
                digests.append(hashlib.md5(f.read()).hexdigest())
    assert digests[0] == digests[1]


def test_budget_sharding_composes_with_tar_writer(spark):
    """shard_by_budget → write_tar_shards: the end-to-end 'carve the
    corpus into ~equal-byte tar shards' pipeline."""
    from clickbom_spark.ext.ranks import shard_by_budget

    blobs = _blobs(60)
    df = spark.createDataFrame(
        [(i, name, data, len(data)) for i, name, data in blobs],
        "id long, name string, data binary, n_bytes long",
    )
    sharded = shard_by_budget(df, ["id"], "n_bytes", budget=400)
    with tempfile.TemporaryDirectory() as tmp:
        write_tar_shards(sharded, tmp)
        back = read_tar_shards(spark, tmp)
        per_shard = (
            back.join(
                df.select("name", "n_bytes"), "name"
            )
            .groupBy("shard_file")
            .agg(F.sum("n_bytes").alias("b"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
    assert sum(r["n"] for r in per_shard) == 60
    max_blob = max(len(d) for _i, _n, d in blobs)
    tail = max(r["shard_file"] for r in per_shard)  # the partial last shard
    for r in per_shard:
        if r["shard_file"] == tail:
            continue
        assert 400 <= r["b"] + max_blob and r["b"] < 400 + max_blob, r
