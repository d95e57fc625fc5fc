"""Incremental aggregate view — a grouped-aggregate table maintained from a
SnapTable's change data feed instead of full-table reaggregation.

The 100 TB motivation: a per-group rollup (docs per source, token totals per
language, ...) over a 10^10-row table costs a full scan + shuffle every time
it is rebuilt, even when an epoch touched 0.01% of rows. With the change
feed, the exact same result is maintained by:

1. reading the feed window (cost ~ changes, never ~ table),
2. point-reading the PRE-image of just the changed keys from the snapshot
   the view was last synced to (bucket-pruned by the key filter SnapTable
   pushes to the parquet scans),
3. point-reading the AFTER-image of those keys from the current snapshot,
4. applying ``new_agg - old_agg`` per group to the view.

Intermediate versions inside the window cancel out: a doc upserted five
times between syncs contributes (after - before) exactly once, so the view
is EXACT (not approximate, not eventually-consistent) — pinned by parity
tests against a from-scratch GROUP BY at every sync point.

Supported aggregates are the decomposable ones (count / sum and whatever is
expressible as sums, e.g. mean = sum/count at read time); min/max are NOT
maintainable from deltas without a re-scan of the shrinking group and are
deliberately out of scope.

The view itself is a SnapTable keyed by the group column, so syncs inherit
the engine's exactly-once commit protocol: the view manifest records the
source snapshot version it reflects (``view_synced_version`` property), and
a replayed sync is a no-op.

Reference note: the reference (embulk-filter-expand_json) has no table or
view lifecycle; this belongs to the engine layer the north_rule adds, and
mirrors what Materialize/Flink call incremental view maintenance, expressed
on Spark + the snapshot log.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


class _RebuildPreferred(Exception):
    """Internal: the incremental path would read more than a full rebuild
    (wide-trickle regime); sync() catches this and rebuilds."""


class IncrementalAggView:
    """count(*) + sum(metric...) per ``group_col`` over a changelog-enabled
    SnapTable, maintained incrementally.

    ``sum_cols`` values are summed with nulls-as-zero (SQL SUM ignores
    NULLs; a null metric contributes 0 either way, so parity with a
    from-scratch GROUP BY holds). Sums are typed from the SOURCE column:
    integral columns accumulate as BIGINT, float/double as DOUBLE (same
    widening SQL SUM applies — no silent truncation of fractional
    metrics); any other type is rejected at view creation. Groups whose
    count reaches 0 are removed from the view.

    ``rebuild_dirty_fraction``: when a sync's changed keys exceed the
    point-read budget AND the dirty buckets hold at least this fraction
    of the table's base bytes (known from manifest metadata — zero extra
    cost), sync() falls back to a full rebuild automatically: the
    bucket-scan path reads the dirty buckets at TWO versions, so past
    ~half the table a single full aggregation is strictly cheaper
    (measured: aggview_incremental.json, all-buckets-dirty regime).
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapTable,
        path: str,
        group_col: str,
        sum_cols: Sequence[str] = (),
        num_buckets: int = 4,
        rebuild_dirty_fraction: float = 0.5,
    ):
        self.spark = spark
        self.source = source
        self.table = SnapTable(spark, path)
        self.group_col = group_col
        self.sum_cols = list(sum_cols)
        self.rebuild_dirty_fraction = float(rebuild_dirty_fraction)
        if not self.table.exists():
            # __g: null-safe surrogate merge key — SQL GROUP BY has a NULL
            # group, but a merge key must hash to a real bucket, so NULL is
            # keyed as a NUL-prefixed sentinel and the true (nullable) group
            # value rides in its own column
            fields = [
                T.StructField("__g", T.StringType(), True),
                T.StructField(group_col, T.StringType(), True),
                T.StructField("n_rows", T.LongType(), True),
            ] + [
                T.StructField(
                    f"sum_{c}", self._sum_type(source, c), True
                )
                for c in self.sum_cols
            ]
            self.table.create(
                T.StructType(fields),
                key="__g",
                num_buckets=num_buckets,
                # synced_version: the SOURCE snapshot version this view
                # reflects. -1 = never synced (view is empty).
                properties={"view_synced_version": -1},
            )
        # typed accumulators come from the VIEW schema so a re-opened view
        # keeps the types it was created with
        vschema = {f.name: f.dataType for f in self.table.schema().fields}
        self.sum_types = {c: vschema[f"sum_{c}"] for c in self.sum_cols}

    @staticmethod
    def _sum_type(source: SnapTable, col: str) -> T.DataType:
        """SQL SUM's widening, made explicit: integral -> BIGINT,
        float/double -> DOUBLE. Anything else (decimal, string, nested) is
        rejected at view CREATION so misconfiguration never silently
        truncates a metric mid-maintenance."""
        dt = {f.name: f.dataType for f in source.schema().fields}.get(col)
        if dt is None:
            raise ValueError(
                f"sum column {col!r} not in source schema"
            )
        if isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            return T.LongType()
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return T.DoubleType()
        raise ValueError(
            f"sum column {col!r} has unsupported type {dt.simpleString()}; "
            "incremental sums support integral and float/double columns"
        )

    # ------------------------------------------------------------------ api
    def synced_version(self) -> int:
        return int(self.table.manifest()["properties"]["view_synced_version"])

    _NULL_KEY = "\x00NULL"

    def read(self) -> DataFrame:
        return self.table.read().drop("__g")

    def _group_agg(self, df: DataFrame, sign: int) -> DataFrame:
        aggs = [
            (F.count(F.lit(1)) * sign).alias("n_rows"),
        ] + [
            (
                F.coalesce(
                    F.sum(F.col(c).cast(self.sum_types[c])),
                    F.lit(0).cast(self.sum_types[c]),
                )
                * sign
            ).alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return (
            df.groupBy(self.group_col)
            .agg(*aggs)
            .withColumn(
                "__g",
                F.coalesce(F.col(self.group_col), F.lit(self._NULL_KEY)),
            )
        )

    def _fold(self, df: DataFrame) -> DataFrame:
        """Sum signed group contributions per surrogate key (the one fold
        used by the incremental delta, the full rebuild, and the merge)."""
        return df.groupBy("__g").agg(
            F.max(self.group_col).alias(self.group_col),
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
        )

    #: changed-key sets up to this size take SnapTable.lookup (literal
    #: IN-filter: manifest-level bucket pruning + pushed parquet predicate
    #: — a true point read). Above it the literal plan gets expensive to
    #: optimize AND evaluate (measured 3.5-5s vs 1.0s at 5k keys over 2M
    #: rows), so larger sets read the DIRTY BUCKETS ONLY (from the feed's
    #: change-file bucket metadata) with a broadcast semi-join on the keys.
    MAX_LOOKUP_KEYS = 64

    def _images(self, version: int, key_values: Optional[list],
                keys_df: DataFrame, dirty_buckets: list) -> DataFrame:
        """Rows of the source at ``version`` restricted to the changed keys.
        Cost scales with the dirty-bucket fraction, not table size: at the
        design scale (thousands of buckets) a trickle epoch touches few."""
        if key_values is not None and len(key_values) <= self.MAX_LOOKUP_KEYS:
            return self.source.lookup(key_values, version=version)
        key = self.source.manifest()["key"]
        snap = self.source.read_buckets(dirty_buckets, version=version)
        # eqNullSafe: NULL is a legal merge-key value and a plain equi-join
        # would drop its image rows, diverging the view from a from-scratch
        # aggregate (lookup() handles the same case with an isNull branch)
        kd = F.broadcast(keys_df.withColumnRenamed(key, "__probe_key"))
        return snap.join(
            kd, on=F.col(key).eqNullSafe(F.col("__probe_key")), how="left_semi"
        )

    def _incremental_delta(
        self, key: str, last: int, src_version: int
    ) -> DataFrame:
        """new − old per group over the changed keys only. Raises ValueError
        (feed trimmed) or FileNotFoundError (pre-image snapshot expired)
        when the incremental inputs are gone, or _RebuildPreferred when the
        bucket-scan path would read more than a rebuild; sync() then
        rebuilds."""
        import functools

        feed = self.source.read_changes(last, src_version)
        keys_df = feed.select(key).distinct()
        key_rows = keys_df.limit(self.MAX_LOOKUP_KEYS + 1).collect()
        key_values = (
            [r[0] for r in key_rows]
            if len(key_rows) <= self.MAX_LOOKUP_KEYS
            else None
        )
        # the changed keys' buckets, straight from the feed's change-file
        # metadata — no scan needed to know where the pre/post-images live
        src_man = self.source.manifest(src_version)
        dirty_buckets = sorted(
            {
                f["bucket"]
                for entry in src_man.get("changes", [])
                if last < entry["version"] <= src_version
                for f in entry["files"]
            }
        )
        if key_values is None:
            # wide-trickle guard (manifest metadata only, zero extra cost):
            # the bucket-scan path reads the dirty buckets at TWO versions,
            # so once those buckets hold >= rebuild_dirty_fraction of the
            # table's bytes, one full aggregation reads less — hand the
            # decision back to sync()
            dset = set(dirty_buckets)
            total = sum(f["bytes"] for f in src_man["files"])
            dirty_bytes = sum(
                f["bytes"]
                for f in src_man["files"]
                if f["bucket"] in dset
            )
            if total > 0 and dirty_bytes / total >= self.rebuild_dirty_fraction:
                raise _RebuildPreferred(
                    f"dirty buckets hold {dirty_bytes}/{total} bytes "
                    f"(>= {self.rebuild_dirty_fraction:.0%})"
                )
        old = self._group_agg(
            self._images(last, key_values, keys_df, dirty_buckets), -1
        )
        new = self._group_agg(
            self._images(src_version, key_values, keys_df, dirty_buckets), +1
        )
        changed = functools.reduce(
            lambda a, b: a | b,
            [F.col(f"sum_{c}") != 0 for c in self.sum_cols],
            F.col("n_rows") != 0,
        )
        return self._fold(old.unionByName(new)).filter(changed)

    def sync(self) -> dict:
        """Advance the view to the source's current snapshot. Exact delta
        maintenance: only changed keys are read, at exactly two versions
        (the last-synced and the current one); everything between cancels.

        First sync from an empty view (synced=-1) is the one unavoidable
        full aggregation — there is no smaller correct answer."""
        src_man = self.source.manifest()
        src_version = src_man["version"]
        key = src_man["key"]
        last = self.synced_version()
        if src_version <= last:
            return {
                "skipped": True,
                "synced_version": last,
                "initial_full": False,
                "full_rebuild": False,
                "rebuild_reason": None,
            }

        full = last < 0
        rebuild_reason = "initial" if full else None
        delta = None
        if not full:
            try:
                delta = self._incremental_delta(key, last, src_version)
            except (ValueError, FileNotFoundError):
                # the feed window was trimmed past changelog_keep, or the
                # pre-image snapshot was expired by GC — the incremental
                # inputs are gone, so rebuild in place: delta = full agg
                # MINUS the current view, which folds to exactly the fresh
                # answer (and deletes vanished groups). Correct at any
                # staleness; costs one full aggregation, as any rebuild must.
                full = True
                rebuild_reason = "feed_unavailable"
            except _RebuildPreferred:
                # wide trickle: the dirty buckets hold most of the table —
                # same rebuild-in-place delta, chosen for COST not necessity
                full = True
                rebuild_reason = "dirty_fraction"
        if full:
            new = self._group_agg(
                self.source.read(version=src_version), +1
            )
            neg_view = self.table.read().select(
                "__g",
                self.group_col,
                (-F.col("n_rows")).alias("n_rows"),
                *[
                    (-F.col(f"sum_{c}")).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            delta = self._fold(new.unionByName(neg_view))

        # the delta is touched-groups-sized; materialize it ONCE so the
        # broadcast fold below and the merge's stage write don't each
        # re-execute the whole image-read pipeline (measured: the double
        # execution roughly doubled sync wall time)
        delta = delta.localCheckpoint(eager=True)

        # fold the delta into the current view state for the touched groups
        cur = self.table.read().join(
            F.broadcast(delta.select("__g")), on="__g", how="left_semi"
        )
        merged = self._fold(cur.unionByName(delta)).withColumn(
            "__gone", F.col("n_rows") <= 0
        )
        res = self.table.merge(
            merged,
            epoch=src_version,  # source version doubles as the view epoch:
            # exactly-once replay of a sync is a recorded no-op
            delete_col="__gone",
            extra_properties={"view_synced_version": src_version},
        )
        return {
            "skipped": bool(res.get("skipped")),
            "synced_version": src_version,
            "initial_full": last < 0,
            "full_rebuild": full,
            "rebuild_reason": rebuild_reason,
        }
