"""The versioned lake as a first-class Structured Streaming SOURCE —
the Delta streaming-source analog, built on Spark 4's Python Data
Source API (pyspark.sql.datasource).

Each manifest version is an offset: a micro-batch carries exactly the
rows of the files ADDED between two snapshots, split one input
partition per file so the actual parquet reads run ON EXECUTORS (this
is the partition-planning ``DataSourceStreamReader``, not the
driver-side "simple" reader — data never funnels through the driver).
Offsets are checkpointed by Spark, so restart/replay is exactly-once
by construction: the same (start, end] version range always plans the
same file partitions.

Semantics (same contract Delta's source documents):

- **Append-only by default.**  A commit that REMOVES files (COW
  update/delete/upsert-with-matches, compaction) is not expressible as
  an append stream; the reader fails fast on it.
- ``ignoreChanges=true`` relaxes this: commits that rewrite files emit
  the rows of their ADDED files (so rewritten rows re-appear —
  downstream must be idempotent per key, exactly Delta's documented
  ``ignoreChanges`` behavior); file removals are ignored.
- ``startingVersion=N`` begins consumption at snapshot N (default:
  everything from v0, i.e. the create commit is the first batch).

Usage::

    spark.dataSource.register(LakeStreamDataSource)
    stream = (spark.readStream.format("lake_stream")
              .option("path", lake.path).load())

Reference basis: Spark's Python Data Source API (SPARK-44076) and the
publicly documented Delta streaming-source semantics; no non-public
interfaces involved.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"


def _mdir(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR)


def _current_version(path: str) -> int:
    best = -1
    try:
        names = os.listdir(_mdir(path))
    except FileNotFoundError:
        return -1
    for name in names:
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def _manifest(path: str, v: int) -> dict:
    with open(os.path.join(_mdir(path), f"v{v}.json")) as f:
        return json.load(f)


def _arrow_to_ddl(field) -> str:
    """Minimal arrow→Spark DDL mapping for the lake's column types."""
    import pyarrow as pa

    t = field.type
    if pa.types.is_int64(t):
        s = "bigint"
    elif pa.types.is_int32(t):
        s = "int"
    elif pa.types.is_float64(t):
        s = "double"
    elif pa.types.is_float32(t):
        s = "float"
    elif pa.types.is_boolean(t):
        s = "boolean"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        s = "string"
    elif pa.types.is_timestamp(t):
        s = "timestamp_ntz" if t.tz is None else "timestamp"
    elif pa.types.is_date(t):
        s = "date"
    elif pa.types.is_decimal(t):
        s = f"decimal({t.precision},{t.scale})"
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        s = f"array<{_arrow_to_ddl(t.value_field)}>"
    else:
        raise ValueError(f"unsupported lake column type: {t}")
    return s


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        # Spark hands options through a case-insensitive map whose
        # keys arrive lowercased — normalize before lookups
        options = {k.lower(): v for k, v in options.items()}
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lake_stream requires option 'path'")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        start = int(options.get("startingversion", 0))
        # offset = "consumed THROUGH version v"; start-1 means the
        # first batch begins at `startingVersion`
        self._initial = {"version": start - 1}
        # field order fixed at plan time so executor-side reads emit
        # tuples in schema order
        self._fields = _schema_fields(self.path)

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        return {"version": max(_current_version(self.path),
                               self._initial["version"])}

    def _added_files(self, v_from: int, v_to: int) -> list[str]:
        """Files added by each commit in (v_from, v_to], enforcing the
        append-only contract per commit (deterministic for a fixed
        range — manifests are immutable — so replay re-plans the same
        partitions)."""
        added: list[str] = []
        prev: set | None = None
        for v in range(max(v_from, -1) + 1, v_to + 1):
            m = _manifest(self.path, v)
            cur = set(m["files"])
            if prev is None:
                prev = (
                    set(_manifest(self.path, v - 1)["files"])
                    if v > 0
                    else set()
                )
            removed = prev - cur
            if removed and not self.ignore_changes:
                raise ValueError(
                    f"lake_stream: commit v{v} ({m.get('message')}) "
                    f"removed {len(removed)} file(s) — not an append-"
                    "only stream.  Set ignoreChanges=true to receive "
                    "rewritten files' rows (downstream must then be "
                    "idempotent per key), or read the change feed "
                    "(ext.manifest.change_feed) for row-level CDC."
                )
            added.extend(sorted(cur - prev))
            prev = cur
        return added

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._added_files(start["version"], end["version"])
        return [
            _FilePartition(os.path.normpath(os.path.join(self.path, f)))
            for f in files
        ] or [_FilePartition("")]  # Spark requires >= 1 partition

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # runs ON THE EXECUTOR that owns this partition
        if not partition.file_path:
            return iter(())
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        cols = [table.column(name).to_pylist() for name, _ in self._fields]
        return zip(*cols) if cols else iter(())

    def commit(self, end: dict) -> None:
        pass


def _schema_fields(path: str) -> list[tuple[str, str]]:
    """(name, ddl) per column, derived from the CURRENT snapshot's
    first data file — the lake's physical schema."""
    import pyarrow.parquet as pq

    v = _current_version(path)
    if v < 0:
        raise ValueError(f"no lake at {path}")
    files = _manifest(path, v)["files"]
    if not files:
        raise ValueError(
            f"lake at {path} has no data files to derive a schema from"
        )
    first = os.path.normpath(os.path.join(path, files[0]))
    schema = pq.read_schema(first)
    return [(f.name, _arrow_to_ddl(f)) for f in schema]


class LakeStreamDataSource(DataSource):
    """``spark.readStream.format("lake_stream")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "lake_stream"

    def schema(self) -> str:
        return ", ".join(
            f"{n} {t}" for n, t in _schema_fields(self.options["path"])
        )

    def streamReader(self, schema) -> LakeStreamReader:
        return LakeStreamReader(dict(self.options))
