"""CSV / JSON-lines connectors: row-level lossless round-trip, including
adversarial strings (embedded delimiters, quotes, newlines), the
NULL-vs-empty-string distinction, and timestamp microsecond fidelity."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickbom_spark.queries import epoch_us

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
    # microsecond fidelity, explicitly (ts is TIMESTAMP_NTZ)
    a = events.agg(F.max(epoch_us("ts"))).first()[0]
    b = back.agg(F.max(epoch_us("ts"))).first()[0]
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


# --- TIMESTAMP_NTZ microsecond fidelity (regression for the
# timestampNTZFormat option in io/formats.py: the default NTZ format
# truncates to milliseconds, silently losing µs precision) ---

NTZ_ROWS = [
    (1, datetime.datetime(2024, 1, 31, 23, 59, 59, 999999)),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 0, 1)),
    (3, datetime.datetime(1999, 12, 31, 12, 34, 56, 789123)),
    (4, None),
]
NTZ_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _ntz_bitexact(spark, back):
    got = {r.id: r.ts for r in back.collect()}
    assert got == {i: ts for i, ts in NTZ_ROWS}


def test_csv_ntz_microsecond_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(NTZ_ROWS, NTZ_SCHEMA)
    path = str(tmp_path / "ntz_csv")
    FMT.write_csv(df, path)
    back = FMT.read_csv(spark, path, NTZ_SCHEMA)
    assert back.schema["ts"].dataType == T.TimestampNTZType()
    _ntz_bitexact(spark, back)


def test_jsonl_ntz_microsecond_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(NTZ_ROWS, NTZ_SCHEMA)
    path = str(tmp_path / "ntz_jsonl")
    FMT.write_jsonl(df, path)
    back = FMT.read_jsonl(spark, path, NTZ_SCHEMA)
    assert back.schema["ts"].dataType == T.TimestampNTZType()
    _ntz_bitexact(spark, back)


# --- ClickHouse TabSeparated connector ---

TSV_ADVERSARIAL = [
    (1, "tab\tinside", 1.5),
    (2, "newline\ninside", -0.25),
    (3, "backslash \\ inside", 0.0),
    (4, None, None),
    (5, "", 2.0),  # empty string is NOT null
    (6, "\\N literal", 3.0),  # data that looks like the null token
    (7, "trailing backslash \\", 1.0),
    (8, "\\t literal escape-looking", 4.0),  # backslash-t DATA, not a tab
    (9, "carriage\rreturn", 5.0),
]


def test_tsv_adversarial_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(TSV_ADVERSARIAL, SCHEMA)
    path = str(tmp_path / "tsv_adv")
    FMT.write_tsv(df, path)
    back = FMT.read_tsv(spark, path, df.schema)
    got = {r.id: (r.s, r.x) for r in back.collect()}
    want = {i: (s, x) for i, s, x in TSV_ADVERSARIAL}
    assert got == want
    rows = {r.id: r for r in back.collect()}
    assert rows[4].s is None and rows[5].s == ""


def test_tsv_events_roundtrip_with_ntz_micros(spark, tmp_path):
    events = read_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "tsv_events")
    FMT.write_tsv(events, path, n_files=3)
    back = FMT.read_tsv(spark, path, events.schema)
    assert back.schema == events.schema
    assert events.exceptAll(back).count() == 0
    assert back.exceptAll(events).count() == 0


def test_orc_ntz_microsecond_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(NTZ_ROWS, NTZ_SCHEMA)
    path = str(tmp_path / "ntz_orc")
    FMT.write_orc(df, path)
    back = FMT.read_orc(spark, path).select("id", "ts")
    assert back.schema["ts"].dataType == T.TimestampNTZType()
    _ntz_bitexact(spark, back)
