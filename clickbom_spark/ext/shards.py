"""WebDataset-style tar sharding for multimodal corpora.

Large-scale multimodal pretraining stores millions of small blobs
(images, audio, captions) as a few thousand large ``.tar`` shards
streamed sequentially at train time (the WebDataset convention:
members of one sample share a basename, ``000123.jpg`` +
``000123.txt``).  This module round-trips that layout with stdlib
``tarfile`` only:

- ``write_tar_shards``: (shard, name, data) rows → one ``.tar`` per
  shard.  Each shard is assembled and written BY ITS OWN TASK — the
  frame is hash-repartitioned on the shard id, so shard files stream
  out of executors in parallel and nothing aggregates on the driver
  (the same side-effect-sink shape as the ClickHouse
  ``foreachPartition`` writer in io/clickhouse.py).  Compose with
  ``ext.ranks.shard_by_budget`` for ~equal-byte shards.
- ``read_tar_shards``: ``binaryFile`` scan of the shard directory +
  an Arrow-batched ``mapInPandas`` untar — one task per shard file,
  members emitted as (shard_file, name, data) rows.

Tar members are written sorted by name with fixed (mtime=0, uid/gid=0)
metadata, so shard bytes are deterministic for a given membership —
shard-level checksums (q_table_checksum's digest pattern) are stable
across rewrites.
"""

from __future__ import annotations

import io as _io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tar_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    name_col: str = "name",
    data_col: str = "data",
) -> None:
    """Write one ``shard-{id:06d}.tar`` per distinct ``shard_col``
    value under ``path`` (a local/shared filesystem directory).

    Rows are repartitioned BY SHARD so each tar is built by exactly one
    task from an in-memory buffer (a shard is a few hundred MB by
    design — the whole point of sharding); members are sorted by name
    for deterministic bytes.
    """
    os.makedirs(path, exist_ok=True)
    slim = df.select(
        F.col(shard_col).cast("long").alias("shard"),
        F.col(name_col).cast("string").alias("name"),
        F.col(data_col).cast("binary").alias("data"),
    ).repartition("shard")

    def write_partition(rows) -> None:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append((r["name"], r["data"]))
        for shard, members in by_shard.items():
            buf = _io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, data in sorted(members):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    tf.addfile(info, _io.BytesIO(bytes(data)))
            tmp = os.path.join(path, f".shard-{shard:06d}.tar.tmp")
            final = os.path.join(path, f"shard-{shard:06d}.tar")
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.replace(tmp, final)  # atomic publish per shard

    slim.foreachPartition(write_partition)


def read_tar_shards(spark, path: str) -> DataFrame:
    """Read a shard directory back as (shard_file, name, data) rows —
    one task per tar (binaryFile splits per file), members extracted
    Arrow-batched in ``mapInPandas``."""
    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    ).select("path", "content")

    def untar(batches):
        import pandas as pd

        for pdf in batches:
            files, names, datas = [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(p)
                with tarfile.open(
                    fileobj=_io.BytesIO(bytes(content)), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        files.append(base)
                        names.append(m.name)
                        datas.append(tf.extractfile(m).read())
            yield pd.DataFrame(
                {"shard_file": files, "name": names, "data": datas}
            )

    return bins.mapInPandas(
        untar, schema="shard_file string, name string, data binary"
    )
