"""Streaming sketches: bounded state across real micro-batch
boundaries, MG survival and KLL weight-exactness guarantees, plus
null/NaN hygiene matching the batch twins."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clickbom_spark.streaming.sketches import (
    streaming_heavy_hitters,
    streaming_quantile_sketch,
)

K = 8
BUCKETS = 4


def _run_stream(spark, df, n_files, make_op, row_of):
    """Drive ``make_op(stream_df)`` over ``n_files`` micro-batches;
    returns ({bucket: {item: payload}} latest-complete-summary view,
    n_batches).  Each emission is a bucket's COMPLETE current summary,
    so later epochs replace that bucket wholesale (evicted items must
    disappear)."""
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        df.repartition(n_files).write.parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = make_op(stream)
        buckets: dict = {}
        n_batches = 0

        def collect_batch(bdf, epoch_id):
            nonlocal n_batches
            n_batches += 1
            touched: dict = {}
            for r in bdf.collect():
                item, payload = row_of(r)
                touched.setdefault(r["bucket"], {})[item] = payload
            buckets.update(touched)

        q = (
            out.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return buckets, n_batches


def _run_hh(spark, df, n_files):
    buckets, nb = _run_stream(
        spark,
        df,
        n_files,
        lambda s: streaming_heavy_hitters(s, "v", n_buckets=BUCKETS, k=K),
        lambda r: (r["value"], (r["est_count"], r["n_bucket"])),
    )
    final = {
        (b, v): ec for b, vals in buckets.items() for v, ec in vals.items()
    }
    return final, nb


def test_streaming_mg_guarantee_across_microbatches(spark):
    rows = [("hot",)] * 300 + [(f"t{i}",) for i in range(400)] + [(None,)] * 20
    df = spark.createDataFrame(rows, "v string")
    final, n_batches = _run_hh(spark, df, n_files=4)
    assert n_batches >= 4  # real micro-batch boundaries exercised

    hot = [(kv, est, nb) for kv, (est, nb) in final.items() if kv[1] == "hot"]
    assert len(hot) == 1
    est, n_bucket = hot[0][1], hot[0][2]
    # MG bound: true - n_bucket/k <= est <= true; nulls never counted
    assert est <= 300
    assert est >= 300 - n_bucket / K, (est, n_bucket)
    assert sum({b: nb for (b, _v), (_e, nb) in final.items()}.values()) <= 700

    # bounded state: no bucket's final summary exceeds k candidates
    from collections import Counter

    per_bucket = Counter(b for (b, _v) in final)
    assert max(per_bucket.values()) <= K
    assert not any(v is None for (_b, v) in final)


def test_streaming_mg_matches_single_batch_guarantee(spark):
    """Slicing must not lose the heavy value: 1-file and 4-file runs
    both retain it (MG survival is order-independent)."""
    rows = [("hot",)] * 120 + [(f"u{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "v string")
    one, _ = _run_hh(spark, df, n_files=1)
    four, _ = _run_hh(spark, df, n_files=4)
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
    (Σ weight == non-null, non-NaN rows seen) and estimate quantiles of
    the full stream within rank-error bounds, with state rebuilt
    correctly across real micro-batch boundaries."""
    import bisect
    import random

    from clickbom_spark.ext.sketches import approx_quantiles_from_sketch

    rng = random.Random(5)
    n = 8000
    data = [rng.random() * 100 for _ in range(n)]
    rows = [(v,) for v in data] + [(None,)] * 10 + [(float("nan"),)] * 10
    df = spark.createDataFrame(rows, "x double")

    buckets, n_batches = _run_stream(
        spark,
        df,
        4,
        lambda s: streaming_quantile_sketch(s, "x", n_buckets=4, k=128),
        lambda r: (object(), (r["value"], r["weight"])),  # keep every row
    )
    assert n_batches >= 4
    summary = [vw for rows_ in buckets.values() for vw in rows_.values()]
    assert sum(w for _, w in summary) == n  # weight-exact, junk excluded

    sk = spark.createDataFrame(summary, "value double, weight long")
    est = approx_quantiles_from_sketch(sk, [0.25, 0.5, 0.9])
    s = sorted(data)
    for p, e in zip([0.25, 0.5, 0.9], est):
        r = bisect.bisect_left(s, e)
        assert abs(r - p * n) <= 0.03 * n, (p, e, r)


def test_streaming_hll_registers_equal_batch_twin(spark):
    """The streaming registers (built-in stateful max aggregation)
    must equal the batch twin's registers after the whole stream is
    consumed — across real micro-batch boundaries."""
    import tempfile

    from clickbom_spark.ext.sketches import hll_registers
    from clickbom_spark.streaming.sketches import streaming_hll_registers

    df = spark.range(3000).select(F.col("id").alias("v"))
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        df.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        regs: dict = {}
        n_batches = 0

        def collect_batch(bdf, epoch_id):
            nonlocal n_batches
            n_batches += 1
            for r in bdf.collect():
                regs[r["bucket"]] = r["rho"]

        q = (
            streaming_hll_registers(stream, "v", p=8)
            .writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    assert n_batches >= 4  # real micro-batch boundaries were crossed
    batch = {
        r["bucket"]: r["rho"]
        for r in hll_registers(df, "v", p=8).collect()
        if r["rho"] > 0
    }
    assert regs == batch
