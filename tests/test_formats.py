"""CSV / JSON-lines connectors: row-level lossless round-trip, including
adversarial strings (embedded delimiters, quotes, newlines), the
NULL-vs-empty-string distinction, and timestamp microsecond fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.io import formats as FMT
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE


def _roundtrip_equal(df, back):
    assert back.schema == df.schema
    assert df.exceptAll(back).count() == 0
    assert back.exceptAll(df).count() == 0


def test_csv_roundtrip_orders_rowlevel(spark, tmp_path):
    orders = read_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_csv")
    FMT.write_csv(orders, path, n_files=3)
    _roundtrip_equal(orders, FMT.read_csv(spark, path, orders.schema))


def test_jsonl_roundtrip_events_rowlevel(spark, tmp_path):
    events = read_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_jsonl")
    FMT.write_jsonl(events, path, n_files=3)
    back = FMT.read_jsonl(spark, path, events.schema)
    _roundtrip_equal(events, back)
    # microsecond fidelity, explicitly
    a = events.agg(F.max(F.unix_micros("ts"))).first()[0]
    b = back.agg(F.max(F.unix_micros("ts"))).first()[0]
    assert a == b


ADVERSARIAL = [
    (1, 'comma, inside', 1.5),
    (2, 'quote " inside', -0.25),
    (3, "newline\ninside", 0.0),
    (4, None, None),  # NULL string and NULL double
    (5, "", 2.0),  # empty string is NOT null
    (6, "unicode ✓ ß 中", 1e-300),
    (7, "\\N literal backslash-N", 3.0),  # data that looks like the null token
    (8, "trailing space ", 1.7976931348623157e308),
]
SCHEMA = "id long, s string, x double"


def test_csv_adversarial_strings(spark, tmp_path):
    df = spark.createDataFrame(ADVERSARIAL, SCHEMA)
    path = str(tmp_path / "adv_csv")
    FMT.write_csv(df, path)
    back = FMT.read_csv(spark, path, df.schema)
    _roundtrip_equal(df, back)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[4]["s"] is None
    assert rows[5]["s"] == ""


def test_jsonl_adversarial_strings(spark, tmp_path):
    df = spark.createDataFrame(ADVERSARIAL, SCHEMA)
    path = str(tmp_path / "adv_jsonl")
    FMT.write_jsonl(df, path)
    back = FMT.read_jsonl(spark, path, df.schema)
    # JSON omits null fields on write; they read back as NULL — but an
    # empty string must still be "" (JSON distinguishes "" from absent).
    assert df.exceptAll(back).count() == 0
    rows = {r["id"]: r for r in back.collect()}
    assert rows[4]["s"] is None
    assert rows[5]["s"] == ""
