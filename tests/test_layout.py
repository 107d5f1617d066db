"""Z-order layout: value correctness of the Morton arithmetic and the
actual file-level data-skipping property of write_zordered.

The skipping test reads parquet FOOTER stats (pyarrow) — the same
min/max bounds Spark's scan uses to prune files — and asserts the
z-ordered layout bounds BOTH interleaved dimensions per file, while a
single-column linear sort bounds only its own column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickbom_spark.ext import layout as L
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE

# 32 files over a 16-bit z-space: each file's z-interval fixes ~5 top
# z-bits = 2-3 bits of EACH interleaved dimension, so a quarter-width
# box predicate can exclude files on either dimension.  (At 8 files
# custkey got only 1 leading bit — a box straddling the midpoint could
# never prune it.)
N_FILES = 32


@pytest.fixture(scope="module")
def orders(spark):
    return read_table(spark, SF_SMOKE, "orders").cache()


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = df.select(
        "x", "y", L.interleave_bits([F.col("x"), F.col("y")], 4).alias("z")
    ).collect()

    def ref(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in out:
        assert r["z"] == ref(r["x"], r["y"])
    # bijective over the grid: 256 distinct z-values
    assert len({r["z"] for r in out}) == 256


def test_quantize_int_bounds_and_monotonicity(spark):
    df = spark.range(0, 1000).select(F.col("id"))
    q = df.select(
        "id", L.quantize_int(F.col("id"), 0, 999, 8).alias("q")
    ).collect()
    vals = [(r["id"], r["q"]) for r in sorted(q)]
    assert all(0 <= v < 256 for _, v in vals)
    assert vals == sorted(vals)  # monotone in the input
    assert vals[0][1] == 0 and vals[-1][1] == 255


def _file_ranges(path_glob, col):
    """Per-file (min, max) of col from parquet footer statistics."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(
            md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)
        )
        out.append((mn, mx))
    return out


def _prune_fraction(ranges, lo, hi):
    """Fraction of files a [lo, hi] predicate can SKIP via min/max."""
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


def test_write_zordered_skips_on_both_dims(spark, orders, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    dims = [F.col("o_custkey"), F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))]
    L.write_zordered(orders, dims, zpath, n_files=N_FILES, bits=8)
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)  # __z dropped

    # box predicate: middle 1/4 of each dimension
    ck = [r[0] for r in orders.select("o_custkey").collect()]
    ts = [r[0] for r in orders.select("o_orderdate").collect()]
    ck_lo, ck_hi = _mid_quarter(ck)
    ts_lo, ts_hi = _mid_quarter(ts)

    z_ck = _prune_fraction(_file_ranges(zpath + "/*.parquet", "o_custkey"), ck_lo, ck_hi)
    z_ts = _prune_fraction(_file_ranges(zpath + "/*.parquet", "o_orderdate"), ts_lo, ts_hi)
    l_ck = _prune_fraction(_file_ranges(lpath + "/*.parquet", "o_custkey"), ck_lo, ck_hi)
    l_ts = _prune_fraction(_file_ranges(lpath + "/*.parquet", "o_orderdate"), ts_lo, ts_hi)

    # linear custkey sort: perfect pruning on custkey, none on date
    assert l_ck >= 0.5
    assert l_ts == 0.0
    # z-order: real pruning on BOTH dimensions
    assert z_ck > 0.0, f"z-layout pruned nothing on custkey ({z_ck})"
    assert z_ts > 0.0, f"z-layout pruned nothing on orderdate ({z_ts})"


def _mid_quarter(vals):
    s = sorted(vals)
    return s[int(len(s) * 0.375)], s[int(len(s) * 0.625)]


def test_zvalue_declared_bounds_no_job(spark):
    """With bounds declared, zvalue must not run a job at plan build —
    proven by handing in a frame whose evaluation would raise."""
    from pyspark.sql import functions as F

    from clickbom_spark.ext import layout as L

    df = spark.createDataFrame([(1, 2)], "a long, b long").withColumn(
        "a", F.when(F.lit(True), F.col("a")).otherwise(F.raise_error("no job"))
    )
    z = L.zvalue(df, [F.col("a"), F.col("b")], bits=4, bounds=[(0, 15), (0, 15)])
    # expression built without touching the data; evaluating it now is fine
    out = df.select(z.alias("z")).collect()
    assert len(out) == 1


def test_zvalue_declared_bounds_matches_observed(spark):
    """Declared bounds equal to the observed min/max must give the same
    z-values as the self-computed path."""
    from pyspark.sql import functions as F

    from clickbom_spark.ext import layout as L

    rows = [(i, (i * 7) % 13) for i in range(50)]
    df = spark.createDataFrame(rows, "a long, b long")
    cols = [F.col("a"), F.col("b")]
    z_auto = df.select(L.zvalue(df, cols, bits=6).alias("z"), "a").collect()
    z_decl = df.select(
        L.zvalue(df, cols, bits=6, bounds=[(0, 49), (0, 12)]).alias("z"), "a"
    ).collect()
    assert {r["a"]: r["z"] for r in z_auto} == {r["a"]: r["z"] for r in z_decl}
