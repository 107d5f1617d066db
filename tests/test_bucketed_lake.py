"""Bucketed-lake laws: the manifest-persisted bucket spec yields a
zero-Exchange co-located join while the layout is intact, re-registers
from metadata alone in a fresh catalog, and falls back to the plain
manifest read the moment the physical layout diverges."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from clickbom_spark.ext.bucketed_lake import (
    _table_name,
    bucket_spec,
    create_bucketed,
    read_bucketed,
)
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_lakes(spark, tmp_path):
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    lo = create_bucketed(
        spark, str(tmp_path / f"o_{uuid.uuid4().hex[:6]}"), orders,
        "o_orderkey", 8,
    )
    ll = create_bucketed(
        spark, str(tmp_path / f"l_{uuid.uuid4().hex[:6]}"), lineitem,
        "l_orderkey", 8,
    )
    return lo, ll


def test_bucketed_lake_join_zero_exchange(spark, tmp_path):
    lo, ll = _mk_lakes(spark, tmp_path)
    spec = bucket_spec(lo)
    assert spec["col"] == "o_orderkey" and spec["n"] == 8
    # the spec pins the exact bucketed file set it was created with
    assert sorted(spec["files"]) == sorted(lo._manifest()["files"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(lo).join(
            read_bucketed(ll), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the co-located path returns exactly the plain-read join
        expected = (
            lo.read()
            .join(ll.read(), F.col("o_orderkey") == F.col("l_orderkey"))
            .count()
        )
        assert joined.count() == expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_read_reregisters_from_manifest_alone(spark, tmp_path):
    """Dropping the catalog entry (= a fresh session) must not lose the
    fast path: the spec in the manifest is enough to rebuild it."""
    lo, ll = _mk_lakes(spark, tmp_path)
    spark.sql(f"DROP TABLE IF EXISTS {_table_name(lo.path)}")
    spark.sql(f"DROP TABLE IF EXISTS {_table_name(ll.path)}")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(lo).join(
            read_bucketed(ll), F.col("o_orderkey") == F.col("l_orderkey")
        )
        assert "Exchange" not in _plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_read_falls_back_after_cow_mutation(spark, tmp_path):
    """A COW mutation leaves old snapshot files on disk (time travel),
    so the directory no longer equals the live snapshot: read_bucketed
    must detect it and serve the manifest read — same rows, no stale
    or doubled data from the directory scan."""
    lo, _ = _mk_lakes(spark, tmp_path)
    n0 = lo.read().count()
    lo.update(
        F.col("o_orderkey") % 7 == 0,
        {"o_orderpriority": F.lit("0-PATCHED")},
    )
    df = read_bucketed(lo)
    assert df.count() == n0
    patched = df.where(F.col("o_orderpriority") == "0-PATCHED").count()
    expected = lo.read().where(F.col("o_orderpriority") == "0-PATCHED").count()
    assert patched == expected > 0
    # time travel still works and still sees the pre-mutation rows
    assert lo.read(0).where(
        F.col("o_orderpriority") == "0-PATCHED"
    ).count() == 0

def test_bucketed_spec_survives_mutation_and_vacuum_falls_back(
    spark, tmp_path
):
    """The ADVICE scenario: COW mutation then vacuum(keep_last=1)
    makes disk == live again, but the live files are plain parquet
    rewrites WITHOUT the bucket-id layout — the fast path must stay
    off (file-set equality alone was an insufficient gate; the spec's
    pinned original file set is the correct one).  The spec itself
    must survive the data commit (it is carried metadata, not dropped
    by _commit)."""
    lo, _ = _mk_lakes(spark, tmp_path)
    n0 = lo.read().count()
    lo.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_orderpriority": F.lit("9-REWRITTEN")},
    )
    # spec survived the data commit...
    spec = bucket_spec(lo)
    assert spec is not None and spec["col"] == "o_orderkey"
    lo.vacuum(keep_last=1)
    # ...disk now equals live again, but bucketedness is gone:
    # read_bucketed must take the manifest path and stay correct
    df = read_bucketed(lo)
    assert df.count() == n0
    got = df.where(F.col("o_orderpriority") == "9-REWRITTEN").count()
    want = lo.read().where(
        F.col("o_orderpriority") == "9-REWRITTEN"
    ).count()
    assert got == want > 0
