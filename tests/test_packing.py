"""Sequence-packing operator invariants (ext/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext.packing import pack_sequences
from clickbom_spark.ext.text import token_count
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE

CAP = 64


def _packed(spark, repartition=None):
    docs = read_table(spark, SF_SMOKE, "documents").select(
        "lang", "source", "doc_id", token_count(F.col("text")).alias("tokens")
    )
    if repartition:
        docs = docs.repartition(repartition)
    return pack_sequences(
        docs, cap=CAP, shard_cols=["lang", "source"], order_col="doc_id",
        tokens_col="tokens",
    )


def test_pack_cap_respected_unless_single_doc(spark):
    packs = (
        _packed(spark)
        .groupBy("lang", "source", "pack_id")
        .agg(F.sum("tokens").alias("pack_tokens"), F.count(F.lit(1)).alias("n"))
    )
    over = packs.where((F.col("pack_tokens") > CAP) & (F.col("n") > 1))
    assert over.count() == 0


def test_pack_ids_contiguous_and_monotone(spark):
    rows = _packed(spark).orderBy("lang", "source", "doc_id").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r.lang, r.source), []).append(r.pack_id)
    for ids in by_shard.values():
        assert ids[0] == 1
        for a, b in zip(ids, ids[1:]):
            assert b in (a, a + 1)  # monotone, no gaps


def test_pack_greedy_is_maximal(spark):
    """A new pack only starts when the previous one genuinely had no room."""
    rows = (
        _packed(spark)
        .orderBy("lang", "source", "doc_id")
        .collect()
    )
    run = {}
    for r in rows:
        key = (r.lang, r.source)
        prev_pack, prev_run = run.get(key, (0, 0))
        if r.pack_id != prev_pack:  # new pack
            if prev_pack:  # not the shard's first
                assert prev_run + r.tokens > CAP
            run[key] = (r.pack_id, r.tokens)
        else:
            run[key] = (prev_pack, prev_run + r.tokens)


def test_pack_partition_invariance(spark):
    a = {tuple(r) for r in _packed(spark).collect()}
    b = {tuple(r) for r in _packed(spark, repartition=7).collect()}
    assert a == b


# --- property: Spark fold ≡ reference greedy fold on random inputs ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _greedy(tokens, cap):
    run, pack, out = 0, 0, []
    for t in tokens:
        if pack == 0 or run + t > cap:
            pack += 1
            run = t
        else:
            run += t
        out.append(pack)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=100),
)
def test_pack_matches_reference_fold(spark, tokens, cap):
    rows = [("s", i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "shard string, ord long, tokens long")
    packed = pack_sequences(
        df, cap=cap, shard_cols=["shard"], order_col="ord", tokens_col="tokens"
    )
    got = [r.pack_id for r in packed.orderBy("ord").collect()]
    assert got == _greedy(tokens, cap)
