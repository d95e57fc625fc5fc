"""SCD Type-2 history replica — a derived table that turns a SnapTable's
change data feed into row VERSION HISTORY: one interval row per (key,
change), carrying the payload plus ``valid_from_epoch`` /
``valid_to_epoch`` (NULL = currently valid) and an ``_scd_open`` flag.
This is the classic CDC downstream product (Debezium -> warehouse
"slowly changing dimension type 2" tables): the source table answers
"what is doc X now", the SCD2 replica answers "what was doc X between
epochs 3 and 7, and when did it change".

Incremental and exactly-once, composed entirely from engine parts:

- each apply() consumes ``source.read_changes(since)`` — the per-commit
  LWW after-images the MERGE already wrote; cost proportional to the
  changes read, never to either table's size;
- interval construction is ONE window over the (delta-sized) change
  batch: ``lead(_commit_version)`` per key closes each upsert at the
  next change, deletes close without opening;
- intervals left open by PREVIOUS applies close via a join of the
  broadcast batch-key set against the open rows only — read through
  ``read_where(_scd_open)`` file skipping, so a mostly-closed history
  table (the steady state: open rows are ~the source's key count, the
  closed tail grows forever) reads a shrinking fraction of its files;
- the result lands in ONE SnapTable.merge keyed by ``_scd_key`` (source
  key @ commit version — commit versions are unique, so interval
  identity is stable) with ``epoch = source version``: re-applying a
  window after a crash is the standard exactly-once skip, and a window
  that grew before the retry still computes the same (correct) closure
  for its prefix.

Falling behind the source's ``changelog_keep`` retention raises the
feed's standard loud error — an SCD2 replica cannot be rebuilt from a
snapshot (history is gone), so the right deployment pins retention to
the apply cadence, exactly Delta's CDF guidance.

The reference (embulk-filter-expand_json) is a stateless per-page
filter; this belongs to the engine layer the north_rule adds
(replication / derived tables over the change feed).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .snaptable import SnapTable

_SCD_META = [
    T.StructField("valid_from_epoch", T.LongType(), True),
    T.StructField("valid_to_epoch", T.LongType(), True),
    # version-clock twins of the epoch bounds: commit VERSIONS are unique
    # per commit while interactive DML commits REUSE the pinned watermark
    # epoch — so under DML traffic the epoch interval can be zero-width
    # (valid_from == valid_to) and only the version interval totally
    # orders the history. Pipelines without DML see both clocks agree.
    T.StructField("valid_from_version", T.LongType(), True),
    T.StructField("valid_to_version", T.LongType(), True),
    T.StructField("_scd_open", T.BooleanType(), True),
    T.StructField("_scd_key", T.StringType(), False),
]


class Scd2Replica:
    """Maintain an SCD2 history table at ``path`` from ``source``'s feed.

    ``apply()`` catches the history up to the source's current version;
    call it on whatever cadence the pipeline runs (per epoch, per N
    epochs, hourly) — each call is one exactly-once commit.
    """

    def __init__(self, spark: SparkSession, source: SnapTable, path: str):
        self.spark = spark
        self.source = source
        self.table = SnapTable(spark, path)

    # ------------------------------------------------------------- schema
    def _ensure_created(self) -> None:
        if self.table.exists():
            return
        src_schema = self.source.schema()
        self.table.create(
            T.StructType(list(src_schema.fields) + list(_SCD_META)),
            key="_scd_key",
            num_buckets=self.source.manifest()["num_buckets"],
            properties={"stats_columns": ["_scd_open"]},
        )

    def _evolve_to_source(self) -> None:
        """Additive source evolution flows through: new payload columns
        append to the history table (older intervals null-fill)."""
        have = {f.name for f in self.table.schema().fields}
        new = [f for f in self.source.schema().fields if f.name not in have]
        if new:
            self.table.evolve_add_columns(new)

    # -------------------------------------------------------------- apply
    def apply(self, to_version: Optional[int] = None) -> dict:
        """Fold source commits (last_applied, to_version] into the
        history. Returns {"applied_through", "skipped"}."""
        self._ensure_created()
        self._evolve_to_source()
        since = self.table.manifest()["last_committed_epoch"]
        src_man = self.source.manifest(to_version)
        end = src_man["version"]
        if since < 0:
            # first apply starts at the feed's validity floor; a feed
            # complete from table birth (changelog at create) means the
            # WHOLE history is captured — no snapshot bootstrap ambiguity
            since = int(src_man.get("changes_valid_from", 0))
        if end <= since:
            return {"applied_through": since, "skipped": True}
        changes = self.source.read_changes(since, to_version=to_version)
        key = self.source.manifest()["key"]

        w = Window.partitionBy(key).orderBy("_commit_version")
        ch = (
            changes.withColumn(
                "__next_epoch", F.lead("_commit_epoch").over(w)
            )
            .withColumn("__next_v", F.lead("_commit_version").over(w))
        )
        payload = [f.name for f in self.source.schema().fields]
        inserts = ch.filter(F.col("_change_type") == "upsert").select(
            *payload,
            F.col("_commit_epoch").alias("valid_from_epoch"),
            F.col("__next_epoch").alias("valid_to_epoch"),
            F.col("_commit_version").alias("valid_from_version"),
            F.col("__next_v").alias("valid_to_version"),
            F.col("__next_v").isNull().alias("_scd_open"),
            F.concat_ws(
                "@",
                F.coalesce(F.col(key).cast("string"), F.lit("␀null")),
                F.col("_commit_version").cast("string"),
            ).alias("_scd_key"),
        )
        # close intervals the PREVIOUS applies left open, at each key's
        # first change in this batch (whether upsert or delete). A plain
        # min-struct aggregate, NOT a min-window over ``ch``: the window
        # form re-ran the feed scan + a second Exchange/Sort/Window pass
        # plus a distinct in this branch (plan audit r6: 4 Windows / 4
        # Exchanges -> 2 / 3); min(struct(version, epoch)) partially
        # aggregates map-side and (key, version) is unique per commit, so
        # the result is identical and deterministic.
        firsts = (
            changes.groupBy(key)
            .agg(
                # plain-long buffers -> HashAggregate; a min(struct) here
                # silently degrades to SortAggregate (struct buffers are
                # not hashable), re-adding per-partition sorts
                F.min("_commit_version").alias("__close_v"),
                F.min_by("_commit_epoch", "_commit_version").alias(
                    "__close_epoch"
                ),
            )
            .select(
                F.col(key).alias("__k"),
                F.col("__close_epoch"),
                F.col("__close_v"),
            )
        )
        open_rows = self.table.read_where("_scd_open", True, True).filter(
            F.col("_scd_open")
        )
        closed = (
            open_rows.join(
                F.broadcast(firsts),
                on=F.col(key).eqNullSafe(F.col("__k")),
                how="inner",
            )
            .withColumn("valid_to_epoch", F.col("__close_epoch"))
            .withColumn("valid_to_version", F.col("__close_v"))
            .withColumn("_scd_open", F.lit(False))
            .select(*[f.name for f in self.table.schema().fields])
        )
        deltas = closed.unionByName(inserts, allowMissingColumns=True)
        r = self.table.merge(deltas, epoch=end)
        return {"applied_through": end, "skipped": r.get("skipped", False)}

    # ------------------------------------------------------------- reads
    def history(self):
        """The full interval table (payload + validity window)."""
        return self.table.read().drop("_scd_key")

    def as_of_version(self, version: int):
        """Point-in-time view by source COMMIT VERSION — the unambiguous
        clock when the source sees interactive DML (which reuses the
        pinned watermark epoch, making epoch intervals zero-width)."""
        return (
            self.table.read()
            .filter(
                (F.col("valid_from_version") <= version)
                & (
                    F.col("valid_to_version").isNull()
                    | (F.col("valid_to_version") > version)
                )
            )
            .drop("_scd_key")
        )

    def as_of_epoch(self, epoch: int):
        """Point-in-time view: every key's payload valid AT ``epoch`` —
        the SCD2 answer to time travel, but by SOURCE epoch rather than
        by this table's own commit clock."""
        return (
            self.table.read()
            .filter(
                (F.col("valid_from_epoch") <= epoch)
                & (
                    F.col("valid_to_epoch").isNull()
                    | (F.col("valid_to_epoch") > epoch)
                )
            )
            .drop("_scd_key")
        )
