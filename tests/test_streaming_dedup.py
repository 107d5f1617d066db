"""Online near-dup filter laws (ext/streaming_dedup.py): admission
semantics on a hand-derived corpus, the stream == sequential-batch
law over a real availableNow file stream, and replay idempotence."""

from __future__ import annotations

import pytest

import os

import pyspark.sql.functions as F

from clickbom_spark.ext.streaming_dedup import (
    admit_batch,
    apply_neardup_batch,
    create_dedup_state,
    neardup_filter_sink,
)

_SCHEMA = "doc_id long, text string"


def _doc(i, base_tokens, change_last=None):
    toks = list(base_tokens)
    if change_last is not None:
        toks[-1] = change_last
    return (i, " ".join(toks))


def _mk_docs():
    """Hand-derived near-dup structure: A-family {1, 2, 4} (one token
    differs — jaccard ≈ 0.85), unique docs 3 and 5, new cluster
    {6, 7}."""
    a = [f"alpha{k}" for k in range(40)]
    c = [f"charlie{k}" for k in range(40)]
    e = [f"echo{k}" for k in range(40)]
    f_ = [f"fox{k}" for k in range(40)]
    batch1 = [_doc(1, a), _doc(2, a, "zz2"), _doc(3, c)]
    batch2 = [_doc(4, a, "zz4"), _doc(5, e), _doc(6, f_), _doc(7, f_, "zz7")]
    return batch1, batch2


@pytest.mark.slow
def test_admission_rule_hand_derived(spark, tmp_path):
    batch1, batch2 = _mk_docs()
    template = spark.createDataFrame(batch1, _SCHEMA)
    corpus, index = create_dedup_state(
        spark, str(tmp_path / "corp"), str(tmp_path / "idx"), template
    )
    apply_neardup_batch(
        corpus, index, spark.createDataFrame(batch1, _SCHEMA), epoch=0
    )
    kept1 = {r["doc_id"] for r in corpus.read().collect()}
    # 2 is a within-batch dup of 1 → min-id representative wins
    assert kept1 == {1, 3}
    apply_neardup_batch(
        corpus, index, spark.createDataFrame(batch2, _SCHEMA), epoch=1
    )
    kept2 = {r["doc_id"] for r in corpus.read().collect()}
    # 4 rejected against the standing index (dup of kept 1);
    # {6,7} is a new within-batch cluster → keep 6
    assert kept2 == {1, 3, 5, 6}
    # the index tracks exactly the kept docs
    idx_ids = {r["id"] for r in index.read().select("id").distinct().collect()}
    assert idx_ids == kept2
    # pure admission check is read-only; re-offering the batch now
    # rejects 4 and 7 against the standing index, while 5 and 6 —
    # already-kept ids — stay admissible (self-pairs are excluded, so
    # re-admission is id-idempotent: the upsert replaces the same row)
    again = admit_batch(
        corpus, index, spark.createDataFrame(batch2, _SCHEMA)
    )
    assert {r["doc_id"] for r in again.collect()} == {5, 6}


@pytest.mark.slow
def test_stream_equals_sequential_batches_and_replay(spark, tmp_path):
    """availableNow stream over ordered batch files == folding the same
    batches through apply_neardup_batch; a fresh-checkpoint replay
    leaves both state lakes untouched (epoch marks)."""
    from clickbom_spark.session import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # three deterministic batches by doc_id range
    bounds = [(0, 170), (170, 340), (340, 10**9)]
    batches = [
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in bounds
    ]
    # reference: sequential batch fold
    ref_corpus, ref_index = create_dedup_state(
        spark, str(tmp_path / "rc"), str(tmp_path / "ri"), docs
    )
    for e, b in enumerate(batches):
        apply_neardup_batch(ref_corpus, ref_index, b, epoch=e)
    ref_ids = {r["doc_id"] for r in ref_corpus.read().collect()}
    assert 0 < len(ref_ids) < docs.count()  # the corpus HAS planted dups

    # stream: one file per batch, mtimes ascending so the file source
    # replays them in order, one file per trigger
    src = tmp_path / "stream_src"
    src.mkdir()
    for e, b in enumerate(batches):
        p = str(src / f"b{e}.parquet")
        b.toPandas().to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + e * 1000, 1_700_000_000 + e * 1000))
    corpus, index = create_dedup_state(
        spark, str(tmp_path / "sc"), str(tmp_path / "si"), docs
    )
    sink = neardup_filter_sink(corpus, index)

    def run_stream(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_stream(str(tmp_path / "ckpt1"))
    got_ids = {r["doc_id"] for r in corpus.read().collect()}
    assert got_ids == ref_ids
    v_corpus, v_index = corpus.current_version(), index.current_version()
    # fresh checkpoint → Spark re-delivers the same files as the same
    # epoch ids; both stores must skip every one
    run_stream(str(tmp_path / "ckpt2"))
    assert corpus.current_version() == v_corpus
    assert index.current_version() == v_index
    assert {r["doc_id"] for r in corpus.read().collect()} == ref_ids


def test_streaming_matview_handles_updates_retractions_and_replay(
    spark, tmp_path
):
    """IVM through UPDATES: a later batch re-keys an existing row into
    another group (retract+insert in the CDF); a group drained to zero
    disappears from the view; replay double-counts nothing."""
    from clickbom_spark.ext.manifest import VersionedLake, sum_agg_of
    from clickbom_spark.ext.streaming_dedup import streaming_matview_sink

    schema = "id long, grp string, cents long"
    b0 = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 50), (3, "b", 10)], schema
    )
    # batch 1: id=3 MOVES from group b to group a (b drains to zero),
    # id=2 changes value, id=4 inserts into c
    b1 = spark.createDataFrame(
        [(3, "a", 10), (2, "a", 70), (4, "c", 5)], schema
    )
    empty = spark.createDataFrame([], schema)
    data_lake = VersionedLake.create(
        spark, str(tmp_path / "d"), empty, n_files=1
    )
    view_lake = VersionedLake.create(
        spark, str(tmp_path / "v"),
        sum_agg_of(empty, ["grp"], ["cents"]), n_files=1,
    )
    sink = streaming_matview_sink(
        data_lake, view_lake, ["id"], ["grp"], ["cents"]
    )
    sink(b0, 0)
    v_after_0 = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in view_lake.read().collect()
    }
    assert v_after_0 == {"a": (2, 150), "b": (1, 10)}
    sink(b1, 1)
    v_after_1 = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in view_lake.read().collect()
    }
    # a: ids 1(100) + 2(70) + 3(10) = 180; b drained away; c: 5
    assert v_after_1 == {"a": (3, 180), "c": (1, 5)}
    # view == full recompute at the epoch boundary (the IVM law)
    full = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in sum_agg_of(
            data_lake.read(), ["grp"], ["cents"]
        ).collect()
    }
    assert v_after_1 == full
    # replaying both epochs changes nothing
    dv, vv = data_lake.current_version(), view_lake.current_version()
    sink(b0, 0)
    sink(b1, 1)
    assert data_lake.current_version() == dv
    assert view_lake.current_version() == vv

@pytest.mark.slow
def test_admit_batch_keeps_ids_off_the_driver(spark, tmp_path, monkeypatch):
    """The backfill path replays arbitrarily large batches through
    admit_batch, so the surviving-id set must stay distributed: no
    DataFrame.collect() anywhere in the admission path (the lineage
    decoupling is a localCheckpoint + semi-join, not a
    collect-and-rebroadcast)."""
    batch1, batch2 = _mk_docs()
    template = spark.createDataFrame(batch1, _SCHEMA)
    corpus, index = create_dedup_state(
        spark, str(tmp_path / "corp"), str(tmp_path / "idx"), template
    )
    apply_neardup_batch(
        corpus, index, spark.createDataFrame(batch1, _SCHEMA), epoch=0
    )
    import pyspark.sql

    def boom(self):
        raise AssertionError("admit_batch materialized rows on the driver")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", boom)
    out = admit_batch(corpus, index, spark.createDataFrame(batch2, _SCHEMA))
    monkeypatch.undo()
    assert {r["doc_id"] for r in out.collect()} == {5, 6}


def test_streaming_matview_rollforward_is_one_atomic_commit(spark, tmp_path):
    """The view's upserts, drained-group deletes, and epoch mark must
    land in ONE snapshot: a crash between a two-step upsert+delete
    would leave the epoch marked but zero-count groups lingering
    forever (replay skips the marked epoch).  Pinned by counting view
    commits per epoch and checking the epoch mark sits on the same
    snapshot that removed the drained group."""
    from clickbom_spark.ext.manifest import VersionedLake, sum_agg_of
    from clickbom_spark.ext.streaming_dedup import streaming_matview_sink

    schema = "id long, grp string, cents long"
    b0 = spark.createDataFrame([(1, "a", 100), (3, "b", 10)], schema)
    # id=3 moves out of group b -> b drains to zero in epoch 1
    b1 = spark.createDataFrame([(3, "a", 10)], schema)
    empty = spark.createDataFrame([], schema)
    data_lake = VersionedLake.create(spark, str(tmp_path / "d"), empty, n_files=1)
    view_lake = VersionedLake.create(
        spark, str(tmp_path / "v"), sum_agg_of(empty, ["grp"], ["cents"]), n_files=1
    )
    sink = streaming_matview_sink(data_lake, view_lake, ["id"], ["grp"], ["cents"])
    sink(b0, 0)
    v_before = view_lake.current_version()
    sink(b1, 1)
    # exactly ONE view commit for the whole epoch-1 roll-forward
    assert view_lake.current_version() == v_before + 1
    m = view_lake._manifest()
    assert m["last_epoch"] == 1 and m["message"] == "epoch-1"
    got = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in view_lake.read().collect()
    }
    assert got == {"a": (2, 110)}  # b is gone in the SAME snapshot
