"""Streaming Misra–Gries heavy hitters: state bounded at n_buckets×k,
the MG survival guarantee holds across real micro-batch boundaries,
and count estimates respect the n_bucket/k error bound."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clickbom_spark.streaming.sketches import streaming_heavy_hitters

K = 8
BUCKETS = 4


def _run_stream(spark, df, n_files):
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        df.repartition(n_files).write.parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_heavy_hitters(stream, "v", n_buckets=BUCKETS, k=K)
        buckets: dict = {}
        n_batches = 0

        def collect_batch(bdf, epoch_id):
            nonlocal n_batches
            n_batches += 1
            rows = bdf.collect()
            # each emission is the bucket's COMPLETE current summary:
            # replace, don't accumulate (evicted values must disappear)
            touched: dict = {}
            for r in rows:
                touched.setdefault(r["bucket"], {})[r["value"]] = (
                    r["est_count"],
                    r["n_bucket"],
                )
            buckets.update(touched)

        q = (
            out.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = {
            (b, v): ec for b, vals in buckets.items() for v, ec in vals.items()
        }
        return final, n_batches


def test_streaming_mg_guarantee_across_microbatches(spark):
    rows = [("hot",)] * 300 + [(f"t{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "v string")
    final, n_batches = _run_stream(spark, df, n_files=4)
    assert n_batches >= 4  # real micro-batch boundaries exercised

    hot = [(kv, est, nb) for kv, (est, nb) in final.items() if kv[1] == "hot"]
    assert len(hot) == 1
    (_, _), est, n_bucket = hot[0][0], hot[0][1], hot[0][2]
    # MG bound: true - n_bucket/k <= est <= true
    assert est <= 300
    assert est >= 300 - n_bucket / K, (est, n_bucket)

    # bounded state: no bucket ever reports more than k candidates
    from collections import Counter

    per_bucket = Counter(b for (b, _v) in final)
    assert max(per_bucket.values()) <= K


def test_streaming_mg_matches_single_batch_guarantee(spark):
    """Slicing must not lose the heavy value: 1-file and 4-file runs
    both retain it (MG survival is order-independent)."""
    rows = [("hot",)] * 120 + [(f"u{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "v string")
    one, _ = _run_stream(spark, df, n_files=1)
    four, _ = _run_stream(spark, df, n_files=4)
    assert any(v == "hot" for (_b, v) in one)
    assert any(v == "hot" for (_b, v) in four)
    # bucket totals agree wherever both runs report the bucket (a
    # bucket whose final summary decremented to empty emits no rows,
    # so it can be absent from one run's view)
    tot_one = {b: nb for (b, _v), (_e, nb) in one.items()}
    tot_four = {b: nb for (b, _v), (_e, nb) in four.items()}
    for b in set(tot_one) & set(tot_four):
        assert tot_one[b] == tot_four[b], b


def test_streaming_quantile_sketch_across_microbatches(spark):
    """The union of final per-bucket KLL summaries must be weight-exact
    (Σ weight == rows seen) and estimate quantiles of the full stream
    within rank-error bounds, with state rebuilt correctly across real
    micro-batch boundaries."""
    import random

    from clickbom_spark.ext.sketches import approx_quantiles_from_sketch
    from clickbom_spark.streaming.sketches import streaming_quantile_sketch

    rng = random.Random(5)
    n = 8000
    data = [rng.random() * 100 for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in data], "x double")

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        df.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_quantile_sketch(stream, "x", n_buckets=4, k=128)
        buckets: dict = {}
        n_batches = 0

        def collect_batch(bdf, epoch_id):
            nonlocal n_batches
            n_batches += 1
            touched: dict = {}
            for r in bdf.collect():
                touched.setdefault(r["bucket"], []).append(
                    (r["value"], r["weight"])
                )
            buckets.update(touched)

        q = (
            out.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    assert n_batches >= 4
    summary = [vw for rows in buckets.values() for vw in rows]
    assert sum(w for _, w in summary) == n  # weight-exact union

    sk = spark.createDataFrame(summary, "value double, weight long")
    probs = [0.25, 0.5, 0.9]
    est = approx_quantiles_from_sketch(sk, probs)
    import bisect

    s = sorted(data)
    for p, e in zip(probs, est):
        r = bisect.bisect_left(s, e)
        assert abs(r - p * n) <= 0.03 * n, (p, e, r)
