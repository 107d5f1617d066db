"""Online (streaming) near-duplicate filtering: the ingestion-time
twin of the batch MinHash dedup — every arriving micro-batch of
documents is checked against the standing corpus BEFORE admission,
duplicates are rejected, survivors extend both the corpus and the
posting index.

This is the shape a continuously-fed training-data pipeline needs at
100 TB: the corpus is never re-hashed (the posting index absorbs each
batch via :func:`clickbom_spark.ext.dedup.incremental_minhash_pairs`),
and both state stores are versioned lakes whose commits carry the
epoch high-water mark — so a replayed micro-batch (Spark's
at-least-once foreachBatch contract) is skipped per-store, and a crash
BETWEEN the two commits self-heals on replay (the store that already
committed skips, the other catches up).

Admission rule (deterministic for a given batch order):

1. a new doc that verifies as a near-dup (jac ≥ t) of ANY already-kept
   doc is rejected;
2. among the remaining batch docs, near-dup clusters WITHIN the batch
   keep only their min-id representative (the same keep-one rule as
   the batch operator).

The stream-vs-batch law — running the filter over an availableNow
file stream equals folding the same batches through
:func:`apply_neardup_batch` sequentially — is pinned in
tests/test_streaming_dedup.py, as is replay idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickbom_spark.ext.dedup import (
    connected_components,
    incremental_minhash_pairs,
    minhash_band_postings,
)
from clickbom_spark.ext.manifest import VersionedLake, epoch_committed


def create_dedup_state(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    schema_template: DataFrame,
    id_col: str = "doc_id",
) -> tuple[VersionedLake, VersionedLake]:
    """Bootstrap the two state lakes empty: the kept corpus (document
    rows) and the posting index ((id, band, bucket) rows)."""
    empty_corpus = schema_template.where(F.lit(False))
    corpus = VersionedLake.create(spark, corpus_path, empty_corpus, n_files=1)
    empty_idx = minhash_band_postings(
        empty_corpus, id_col=id_col
    ).where(F.lit(False))
    index = VersionedLake.create(spark, index_path, empty_idx, n_files=1)
    return corpus, index


def admit_batch(
    corpus: VersionedLake,
    index: VersionedLake,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Compute the batch's ADMITTED subset against the current state
    (pure read — no commits).  Returns the surviving rows of ``batch``.

    The pair frame is batch-bounded, so it is cached only for the
    duration of this call (explicitly unpersisted — no storage leaks
    into the caller's session) and the final admit is a semi-join of
    the batch against the surviving id set.
    """
    idx = index.read()
    kept = corpus.read()
    verify_corpus = kept.unionByName(batch)
    pairs, _ = incremental_minhash_pairs(
        idx, batch, verify_corpus,
        id_col=id_col, text_col=text_col, threshold=threshold,
    )
    pairs = pairs.cache()
    try:
        kept_ids = kept.select(F.col(id_col).alias("_kid"))
        # rule 1: reject batch docs paired with an already-kept doc
        hit_a = pairs.join(
            kept_ids, pairs["id_b"] == F.col("_kid"), "left_semi"
        ).select(F.col("id_a").alias("_rid"))
        hit_b = pairs.join(
            kept_ids, pairs["id_a"] == F.col("_kid"), "left_semi"
        ).select(F.col("id_b").alias("_rid"))
        rejected = hit_a.unionByName(hit_b).distinct()
        stage1 = batch.join(
            rejected, batch[id_col] == F.col("_rid"), "left_anti"
        )
        # rule 2: within-batch clusters among stage-1 survivors keep
        # the min-id representative (connected components over the
        # surviving batch-batch pair graph)
        s1_ids = stage1.select(F.col(id_col).alias("_sid"))
        bb = (
            pairs.join(s1_ids, pairs["id_a"] == F.col("_sid"), "left_semi")
            .join(s1_ids, pairs["id_b"] == F.col("_sid"), "left_semi")
            .select("id_a", "id_b")
        )
        if bb.limit(1).count() > 0:
            comps = connected_components(bb)  # (id, min id in cluster)
            drop2 = comps.where(F.col("id") != F.col("component")).select(
                F.col("id").alias("_rid")
            )
            stage1 = stage1.join(
                drop2, stage1[id_col] == F.col("_rid"), "left_anti"
            )
        # Truncate lineage while the cache is live so the returned
        # frame no longer references the cached pairs.  localCheckpoint
        # keeps the surviving id set DISTRIBUTED on executors — the
        # backfill path replays arbitrarily large batches through this
        # same function, so the ids must never be materialized on the
        # driver.
        ids = stage1.select(id_col).localCheckpoint(eager=True)
        return batch.join(ids, id_col, "left_semi")
    finally:
        pairs.unpersist()


def apply_neardup_batch(
    corpus: VersionedLake,
    index: VersionedLake,
    batch: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> None:
    """Admit one batch and commit survivors to both state lakes with
    the epoch mark.  Safe to replay: each lake skips epochs it has
    already applied, so a crash between the two commits self-heals."""
    do_corpus = not epoch_committed(corpus, epoch)
    do_index = not epoch_committed(index, epoch)
    if not do_corpus and not do_index:
        return
    survivors = admit_batch(
        corpus, index, batch, id_col, text_col, threshold
    )
    survivors = survivors.localCheckpoint(eager=True)
    if survivors.limit(1).count() == 0:
        # an empty admission is a metadata-only epoch bump on each
        # store, so the replay contract still holds
        if do_corpus:
            corpus._commit_meta(lambda p: {**p, "last_epoch": epoch},
                                f"epoch-{epoch}")
        if do_index:
            index._commit_meta(lambda p: {**p, "last_epoch": epoch},
                               f"epoch-{epoch}")
        return
    if do_corpus:
        corpus.upsert(
            survivors, [id_col], message=f"epoch-{epoch}", epoch=epoch
        )
    if do_index:
        post = minhash_band_postings(
            survivors, id_col=id_col, text_col=text_col
        )
        index.upsert(
            post, ["id", "band"], message=f"epoch-{epoch}", epoch=epoch
        )


def neardup_filter_sink(
    corpus: VersionedLake,
    index: VersionedLake,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
):
    """foreachBatch body wiring :func:`apply_neardup_batch` into a
    Structured Streaming query."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        apply_neardup_batch(
            corpus, index, batch_df, int(epoch_id),
            id_col, text_col, threshold,
        )

    return body


# ---------------------------------------------------------------------------
# Streaming materialized view: ingest micro-batches into a versioned
# lake AND roll a (group, count, sums) aggregate forward from each
# commit's change feed — the ClickHouse materialized-view /
# AggregatingMergeTree pattern with exactly-once epochs.
# ---------------------------------------------------------------------------


def streaming_matview_sink(
    data_lake: "VersionedLake",
    view_lake: "VersionedLake",
    key_cols: list,
    group_cols: list,
    sum_cols: list,
):
    """foreachBatch body maintaining a materialized sum/count aggregate
    incrementally: each micro-batch (1) upserts into ``data_lake`` as
    one epoch-marked snapshot, (2) applies ONLY that commit's change
    feed to the aggregate stored in ``view_lake`` (shared files are
    never re-read — IVM cost scales with the batch), and (3) commits
    the rolled-forward view epoch-marked.  Both stores skip epochs they
    already applied, so replay is exactly-once and a crash between the
    two commits self-heals — the view never double-counts a batch.

    The view roll-forward is ONE atomic epoch-marked commit (a CDC
    merge carrying U rows for surviving groups and D rows for groups
    drained to zero).  A two-step upsert-then-delete would be
    unrecoverable across a crash between the steps: on replay the
    epoch mark is already set, the delete never runs, and zero-count
    groups linger forever — violating the view law below.

    The maintained table is exactly ``sum_agg_of(data, group_cols,
    sum_cols)`` of the full data at every epoch boundary (law pinned in
    tests and by the q_stream_matview oracle).
    """
    from clickbom_spark.ext.manifest import (
        change_feed,
        maintain_sum_agg,
    )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        data_done = epoch_committed(data_lake, e)
        view_done = epoch_committed(view_lake, e)
        if data_done and view_done:
            return
        if batch_df.isEmpty():
            return
        if not data_done:
            data_lake.upsert(
                batch_df, key_cols, message=f"epoch-{e}", epoch=e
            )
        if view_done:
            return
        v_to = data_lake.current_version()
        # the epoch's data commit is the LAST commit; its predecessor
        # is the state the view currently reflects
        v_from = v_to - 1
        rolled = maintain_sum_agg(
            data_lake,
            view_lake.read(),
            v_from,
            v_to,
            group_cols,
            key_cols,
            sum_cols,
        ).localCheckpoint(eager=True)
        from pyspark.sql import functions as FF

        # one snapshot carries upserts + deletes + the epoch mark:
        # U rows replace surviving groups, D rows remove groups whose
        # count drained to zero (they vanish from `rolled` but would
        # otherwise linger — upsert alone never deletes).  No driver
        # materialization: the drained set stays a DataFrame.
        gone = view_lake.read().join(
            rolled.select(*group_cols), group_cols, "left_anti"
        )
        cdc = rolled.withColumn("op", FF.lit("U")).unionByName(
            gone.withColumn("op", FF.lit("D"))
        )
        view_lake.merge_cdc(
            cdc, group_cols, message=f"epoch-{e}", epoch=e
        )

    return body
