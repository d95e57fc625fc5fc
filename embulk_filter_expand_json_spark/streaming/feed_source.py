"""Structured Streaming SOURCE over a SnapTable's change data feed — the
"table as a stream" half of the CDC story (Delta's ``readStream`` on a CDF
table; Iceberg's incremental read), built on Spark 4's Python DataSource
API so the feed registers as a first-class ``readStream`` format:

    spark.dataSource.register(SnapTableChangesDataSource)
    (spark.readStream.format("snaptable_changes")
          .option("path", table_path)
          .load()
          .writeStream...)

Semantics mirror ``SnapTable.read_changes`` exactly (same columns:
table schema + _change_type/_commit_version/_commit_epoch; same LWW
one-row-per-key-per-commit contract; same retention failure mode):

- **Offsets are manifest versions.** ``initialOffset`` starts at the
  feed's ``changes_valid_from`` (or the ``since_version`` option);
  ``latestOffset`` is the table's current version, read from the manifest
  — a single small JSON read, no Spark job, so the source polls at
  metadata cost.
- **One input partition per change file.** The micro-batch (start, end]
  maps to the retained change entries of the LATEST manifest (per-commit
  manifests may be GC'd; the latest always carries the retained window —
  same resolution rule as streaming/replicate.py). Executors read their
  file with pyarrow directly: no shuffle, cost proportional to the
  changes read, never to table size.
- **Falling past retention fails loudly** (same ValueError contract as
  read_changes): a consumer that slept past ``changelog_keep`` commits
  must restart from a snapshot read, exactly Delta's CDF contract.

Exactly-once composes with Spark's own streaming checkpoint: offsets are
versions, the engine replays (start, end] deterministically, and sinks
dedupe by batch id (e.g. CdcPipeline.apply_micro_batch in foreachBatch).

The reference (embulk-filter-expand_json) is a per-page batch filter with
no notion of a table or a stream; this module belongs to the engine layer
the north_rule adds.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_META_FIELDS = [
    T.StructField("_change_type", T.StringType(), False),
    T.StructField("_commit_version", T.LongType(), False),
    T.StructField("_commit_epoch", T.LongType(), False),
]


def _latest_manifest(table_path: str) -> dict:
    """Pure-filesystem manifest read (no SparkSession — the DataSource API
    runs this in a plain Python worker)."""
    log_dir = os.path.join(table_path, "_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"SnapTable at {table_path} does not exist")
    versions = sorted(
        int(n[1:-5])
        for n in os.listdir(log_dir)
        if n.startswith("v") and n.endswith(".json")
    )
    if not versions:
        raise FileNotFoundError(f"SnapTable at {table_path} does not exist")
    with open(os.path.join(log_dir, f"v{versions[-1]:08d}.json")) as f:
        return json.load(f)


class _ChangeFilePartition(InputPartition):
    def __init__(self, path: str, change_type: str, version: int, epoch: int):
        self.path = path
        self.change_type = change_type
        self.version = version
        self.epoch = epoch


class SnapTableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._path = options["path"]
        self._since: Optional[str] = options.get("since_version")

    # ------------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        man = _latest_manifest(self._path)
        if "changes" not in man:
            raise ValueError(
                "change feed not enabled: create the table with "
                "properties={'changelog': True}"
            )
        if self._since is not None:
            return {"version": int(self._since)}
        return {"version": int(man.get("changes_valid_from", 0))}

    def latestOffset(self) -> dict:
        return {"version": int(_latest_manifest(self._path)["version"])}

    # ---------------------------------------------------------- partitions
    def partitions(self, start: dict, end: dict):
        man = _latest_manifest(self._path)
        since = int(start["version"])
        valid_from = int(man.get("changes_valid_from", 0))
        if since < valid_from:
            raise ValueError(
                f"change feed incomplete before version {valid_from} "
                f"(stream offset at {since}): entries were trimmed past "
                "changelog_keep — restart this consumer from a full "
                "snapshot read"
            )
        parts = []
        for entry in man.get("changes", []):
            if not (since < entry["version"] <= int(end["version"])):
                continue
            for f in entry["files"]:
                parts.append(
                    _ChangeFilePartition(
                        os.path.join(self._path, f["path"]),
                        "delete" if f["delete"] else "upsert",
                        int(entry["version"]),
                        int(entry["epoch"]),
                    )
                )
        return parts

    # --------------------------------------------------------------- read
    def read(self, partition: _ChangeFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        n = table.num_rows
        table = table.append_column(
            "_change_type", pa.array([partition.change_type] * n, pa.string())
        )
        table = table.append_column(
            "_commit_version", pa.array([partition.version] * n, pa.int64())
        )
        table = table.append_column(
            "_commit_epoch", pa.array([partition.epoch] * n, pa.int64())
        )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # offsets are durable manifest versions; Spark's checkpoint owns
        # stream progress — nothing to persist on our side
        pass


class SnapTableChangesBatchReader(DataSourceReader):
    """Batch flavor of the same format: the whole retained window (or
    since_version..latest) in one read — read_changes through the
    DataSource front door, same partition/read kernels as the stream."""

    def __init__(self, schema: T.StructType, options: dict):
        self._stream = SnapTableChangesStreamReader(schema, options)

    def partitions(self):
        start = self._stream.initialOffset()
        end = self._stream.latestOffset()
        return self._stream.partitions(start, end)

    def read(self, partition: _ChangeFilePartition) -> Iterator:
        return self._stream.read(partition)


class SnapTableChangesDataSource(DataSource):
    """``spark.read[Stream].format("snaptable_changes").option("path", p)``.

    Options: ``path`` (required, the SnapTable root);
    ``since_version`` (optional, start offset — default: the feed's
    ``changes_valid_from``, i.e. everything retained)."""

    @classmethod
    def name(cls) -> str:
        return "snaptable_changes"

    def schema(self) -> T.StructType:
        man = _latest_manifest(self.options["path"])
        base = T.StructType.fromJson(man["schema"])
        return T.StructType(list(base.fields) + list(_META_FIELDS))

    def reader(self, schema: T.StructType) -> SnapTableChangesBatchReader:
        return SnapTableChangesBatchReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> SnapTableChangesStreamReader:
        return SnapTableChangesStreamReader(schema, self.options)
