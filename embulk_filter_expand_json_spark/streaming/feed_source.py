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
- **Mid-stream schema evolution fails loudly.** Files OLDER than the
  stream's declared schema null-fill (a stream started after an
  ``evolve_add_columns`` reads the whole retained window seamlessly),
  but a file carrying columns the running stream has never declared
  (the table evolved underneath it) raises with restart guidance rather
  than silently dropping the new column — a restart on the same
  checkpoint picks up the evolved schema and replays the failed batch
  from its WAL offset (Delta's additive-evolution streaming contract).

Exactly-once composes with Spark's own streaming checkpoint: offsets are
versions, the engine replays (start, end] deterministically, and sinks
dedupe by batch id (e.g. CdcPipeline.apply_micro_batch in foreachBatch).

The reference (embulk-filter-expand_json) is a per-page batch filter with
no notion of a table or a stream; this module belongs to the engine layer
the north_rule adds.

**Why there is no matching ``writeStream.format("snaptable")`` sink:**
the Python DataSource API runs ``DataSourceStreamWriter.commit(messages,
batchId)`` in a detached Python worker (PythonStreamingSinkCommitRunner)
with NO SparkSession, so a sink commit could only do metadata work — it
could not run the LWW dedup / bucket-stage / MERGE jobs that give
SnapTable its exactly-once semantics, and a file-registering append
writer would silently break the table's bucket invariants. The write
path is therefore ``foreachBatch`` + ``CdcPipeline.apply_micro_batch``
(epoch = batchId gives idempotent exactly-once MERGE), which is the
pattern Delta itself prescribes for merge-into-from-a-stream.
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
    runs this in a plain Python worker). Routed through the same TableFS
    layer as SnapTable, so ``path`` may be a URI (s3://, hdfs://, ...)."""
    import posixpath

    from .fs import fs_for_path

    fs, root = fs_for_path(table_path)
    log_dir = posixpath.join(root, "_log")
    versions = sorted(
        int(n[1:-5])
        for n in fs.list_names(log_dir)
        if n.startswith("v") and n.endswith(".json")
    )
    if not versions:
        raise FileNotFoundError(f"SnapTable at {table_path} does not exist")
    return json.loads(
        fs.read_text(posixpath.join(log_dir, f"v{versions[-1]:08d}.json"))
    )


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
        # Rate limit (Delta's maxFilesPerTrigger, by commit version): cap
        # each micro-batch at this many manifest versions past the last
        # planned offset, from the SECOND batch of this reader's lifetime
        # onward. Batch 0 is uncapped BY NECESSITY, not oversight: Spark
        # resolves latestOffset() BEFORE initialOffset() on a fresh start
        # (verified empirically under both processingTime and the
        # availableNow single-batch fallback), and the Python DataSource
        # API exposes no SupportsAdmissionControl variant where
        # latestOffset sees the start offset. Returning any value lower
        # than the true latest on that first call could land BEHIND a
        # restart checkpoint (which latestOffset cannot see), making Spark
        # plan a regressed batch, commit a regressed offset, and replay
        # already-sunk versions after the next crash. Uncapped-first /
        # capped-thereafter is the only deadlock-free, replay-free policy
        # this API admits; bound a fresh start's first batch with
        # since_version. If/when pyspark exposes admission control, move
        # the cap there.
        mv = options.get("max_versions_per_batch")
        self._max_versions: Optional[int] = int(mv) if mv is not None else None
        # byte-based cap (Delta's maxBytesPerTrigger): admit whole commit
        # versions until their change files' cumulative bytes (sizes ride
        # the manifest — no stat calls) would exceed the cap; always at
        # least one version so the stream advances. Same first-batch
        # exemption as the version cap, same reason.
        mb = options.get("max_bytes_per_batch")
        self._max_bytes: Optional[int] = int(mb) if mb is not None else None
        # floor for the cap: last offset this reader has planned through.
        # Seeded by initialOffset (fresh start) or partitions() (restart
        # from checkpoint).
        self._planned_through: Optional[int] = None

    def _trace(self, msg: str) -> None:
        p = os.environ.get("SNAPTABLE_FEED_TRACE")
        if p:
            with open(p, "a") as f:
                f.write(f"[{id(self)}:pid{os.getpid()}] {msg}\n")

    # ------------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        man = _latest_manifest(self._path)
        if "changes" not in man:
            raise ValueError(
                "change feed not enabled: create the table with "
                "properties={'changelog': True}"
            )
        if self._since is not None:
            start = int(self._since)
        else:
            start = int(man.get("changes_valid_from", 0))
        self._planned_through = start
        self._trace(f"initialOffset -> {start}")
        return {"version": start}

    def latestOffset(self) -> dict:
        man = _latest_manifest(self._path)
        latest = int(man["version"])
        if self._planned_through is not None:
            if self._max_versions is not None:
                latest = min(
                    latest, self._planned_through + self._max_versions
                )
            if self._max_bytes is not None:
                admitted, budget = self._planned_through, self._max_bytes
                saw_entry = False
                for entry in man.get("changes", []):
                    v = int(entry["version"])
                    if v <= self._planned_through or v > latest:
                        continue
                    saw_entry = True
                    budget -= sum(
                        int(f.get("bytes", 0)) for f in entry["files"]
                    )
                    if budget < 0 and admitted > self._planned_through:
                        break  # cap hit — but always admit >=1 version
                    admitted = v
                    if budget < 0:
                        break
                # versions with no change entry (evolve/compact commits)
                # carry zero change bytes: if none of the pending versions
                # has an entry, don't cap — capping to `admitted` would
                # wedge the stream below a metadata-only commit forever
                if saw_entry:
                    latest = min(latest, admitted)
        self._trace(f"latestOffset planned={self._planned_through} -> {latest}")
        return {"version": latest}

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
        self._planned_through = max(
            self._planned_through or 0, int(end["version"])
        )
        self._trace(f"partitions {start}..{end}")
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
        from pyspark.sql.pandas.types import to_arrow_type

        # pyarrow resolves the filesystem from the path itself (local path
        # or s3://, gs://, hdfs:// URI) — executors need no extra plumbing
        table = pq.read_table(partition.path)
        n = table.num_rows
        # A change file carrying columns BEYOND the declared schema means
        # the table evolved after this stream resolved its schema. Spark
        # cannot widen a running stream's schema, and silently projecting
        # the new column away would be data loss in a CDC feed — so fail
        # loudly with restart guidance instead (Delta's additive-evolution
        # streaming contract). The restart is checkpoint-safe: offsets are
        # manifest versions, the new reader declares the evolved schema,
        # and the replayed batch null-fills pre-evolution files. The batch
        # reader shares this kernel but always declares the LATEST schema,
        # a superset of every retained file under additive-only evolution,
        # so only a live stream can trip this.
        declared = {f.name for f in self._schema.fields}
        widened = [c for c in table.column_names if c not in declared]
        if widened:
            raise ValueError(
                f"change file {partition.path} carries columns {widened} "
                "not in this stream's declared schema: the table evolved "
                "after the stream started. Restart the stream on the same "
                "checkpoint to pick up the evolved schema (offsets are "
                "commit versions; the restart resumes exactly where this "
                "batch began)."
            )
        # Align every file to the DECLARED schema, exactly as the batch
        # path's spark.read.schema(...) does: change files written before
        # an evolve_add_columns carry fewer columns, and PySpark's
        # records_to_arrow_batches rejects a column-count mismatch (and
        # binds later batches positionally). Missing declared columns
        # null-fill with the declared type; present columns cast and
        # reorder into declared order; meta columns are partition consts.
        meta_values = {
            "_change_type": partition.change_type,
            "_commit_version": partition.version,
            "_commit_epoch": partition.epoch,
        }
        names, arrays = [], []
        for field in self._schema.fields:
            at = to_arrow_type(field.dataType)
            if field.name in meta_values:
                arr = pa.array([meta_values[field.name]] * n, at)
            elif field.name in table.column_names:
                arr = table.column(field.name).cast(at)
            else:
                arr = pa.nulls(n, at)
            names.append(field.name)
            arrays.append(arr)
        yield from pa.Table.from_arrays(arrays, names=names).to_batches()

    def commit(self, end: dict) -> None:
        # offsets are durable manifest versions; Spark's checkpoint owns
        # stream progress — nothing to persist on our side
        pass


class SnapTableChangesBatchReader(DataSourceReader):
    """Batch flavor of the same format: the whole retained window (or
    since_version..latest) in one read — read_changes through the
    DataSource front door, same partition/read kernels as the stream."""

    def __init__(self, schema: T.StructType, options: dict):
        # the rate limits are a streaming concept — a batch read is one
        # read of the whole requested window, never truncated
        options = {
            k: v
            for k, v in options.items()
            if k not in ("max_versions_per_batch", "max_bytes_per_batch")
        }
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
    ``changes_valid_from``, i.e. everything retained);
    ``max_versions_per_batch`` (optional, streaming only — cap each
    micro-batch at this many commit versions, Delta's
    ``maxFilesPerTrigger`` analogue);
    ``max_bytes_per_batch`` (optional, streaming only — admit whole
    commit versions until their change files' cumulative bytes would
    exceed this, Delta's ``maxBytesPerTrigger``; at least one version
    per batch so the stream always advances; sizes come from the
    manifest, no stat calls). For both caps the FIRST batch of each
    reader lifetime is uncapped — the Python DataSource API gives
    ``latestOffset`` no view of the start offset, so a lower first
    offset could regress behind a restart checkpoint and replay data;
    combine with ``since_version`` to bound a fresh start's batch 0."""

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
