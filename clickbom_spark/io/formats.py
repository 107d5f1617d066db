"""Schema-explicit CSV / JSON-lines source and sink adapters.

Reference parity: the reference ingests JSON documents (SBOMs) and
emits TSV for its warehouse insert (entrypoint.sh jq @tsv semantics);
this module is the general columnar-table version of those text
formats, with the options pinned so a write→read round-trip is
LOSSLESS for every corpus type (long, double, string, timestamp):

- explicit schema on read (never inferSchema — schema drift on 100 TB
  of text files is silent data corruption);
- timestamps serialized at microsecond precision;
- doubles serialized in shortest-round-trip form (Spark default), so
  text → double parses back bit-identical;
- CSV quoting/escaping pinned to RFC-4180-style double-quote doubling
  so embedded commas, quotes, and newlines survive (multiLine on
  read for the newline case).

Scale: both formats read/write per-partition with no driver
involvement; CSV/JSON text is splittable line-wise (multiLine CSV
files are not — that option exists for correctness on quoted
newlines, and the writer keeps them by default since corpus strings
may embed them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": TS_FMT,
    # TIMESTAMP_NTZ columns are formatted by a *separate* option; the
    # default truncates to milliseconds, silently losing µs precision.
    "timestampNTZFormat": TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    "quote": '"',
    "escape": '"',  # RFC-4180 quote doubling
    "multiLine": "true",  # quoted embedded newlines
    # both the reader AND writer trim unquoted whitespace by default —
    # data-mangling for a connector; pinned off on both sides
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}

_JSON_OPTS = {"timestampFormat": TS_FMT, "timestampNTZFormat": TS_FMT}


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    out = df.repartition(n_files) if n_files else df
    w = out.write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    r = spark.read.schema(schema)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return r.csv(path)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    out = df.repartition(n_files) if n_files else df
    w = out.write.mode("overwrite")
    for k, v in _JSON_OPTS.items():
        w = w.option(k, v)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    r = spark.read.schema(schema)
    for k, v in _JSON_OPTS.items():
        r = r.option(k, v)
    return r.json(path)


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Columnar ORC sink (zlib default), the warehouse-interchange format.

    Binary columnar: types (incl. TIMESTAMP_NTZ at µs precision) survive
    without text-format pinning; splittable stripes give scan parallelism.
    """
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — self-describing schema, footer-stats predicate pushdown."""
    return spark.read.orc(path)
