"""CdcPipeline — the epoch-replay driver (north_rule engine layer).

``binlog tail -> expand -> LWW dedup -> MERGE`` as a checkpointed
micro-batch loop over a partitioned change log:

1. read one epoch's change slice (parquet partition-pruned on ``epoch``)
2. expand the JSON payload with the reference-semantics operator
   (Catalyst fast path — the payload paths are all definite),
   invalid records routed to the skip channel and counted
3. additive schema evolution: new top-level payload keys (via
   ``json_object_keys``) become nullable string columns on the target
4. last-writer-wins dedup on (doc_id, log_offset)
5. idempotent SnapTable MERGE (epoch-keyed exactly-once commit)
6. append lineage + metrics to the checkpointed offset log

Resume = continue from ``last_committed_epoch + 1``; re-applied epochs are
no-ops, so a crash anywhere leaves the table consistent (the reference
delegates all of this to the Embulk framework's transaction/resume model —
ExpandJsonFilterPlugin.java:98-137 — our engine owns it explicitly).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from embulk_filter_expand_json_spark.operators.dedup_lww import lww_dedup
from embulk_filter_expand_json_spark.operators.expand import expand_json
from embulk_filter_expand_json_spark.plans.expand_plan import (
    ExpandConfig,
    ExpandedColumn,
)
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

#: the tokenized-sequence table (BASELINE.json input_hint, exact shape)
SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

#: payload keys that are part of the CDC envelope, never data columns
_BASE_KEYS = {"doc_id", "tokens", "n_tok", "source"}


@dataclass
class EpochMetrics:
    epoch: int
    rows_in: int = 0
    invalid: int = 0
    deletes: int = 0
    upserts: int = 0
    dedup_dropped: int = 0
    evolved_columns: List[str] = field(default_factory=list)
    buckets_touched: int = 0
    skipped: bool = False
    wall_sec: float = 0.0
    start_offset: Optional[int] = None
    end_offset: Optional[int] = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        changes_path: str,
        table_path: str,
        key: str = "doc_id",
        order: str = "log_offset",
        lww_strategy: str = "agg",
        num_buckets: int = 16,
        auto_evolve: bool = True,
        collect_metrics: bool = True,
    ):
        self.spark = spark
        self.changes_path = changes_path
        self.table = SnapTable(spark, table_path)
        self.key = key
        self.order = order
        self.lww_strategy = lww_strategy
        self.auto_evolve = auto_evolve
        self.collect_metrics = collect_metrics
        self.offsets_log = os.path.join(table_path, "_checkpoints", "offsets.jsonl")
        if not self.table.exists():
            self.table.create(SEQUENCES_SCHEMA, key=key, num_buckets=num_buckets)

    # ----------------------------------------------------------- checkpoints
    def last_committed_epoch(self) -> int:
        return self.table.manifest()["last_committed_epoch"]

    def _append_lineage(self, m: EpochMetrics) -> None:
        os.makedirs(os.path.dirname(self.offsets_log), exist_ok=True)
        with open(self.offsets_log, "a") as f:
            f.write(m.to_json() + "\n")

    # ------------------------------------------------------------ expansion
    def _expand_config(self, extra_string_cols: List[str]) -> ExpandConfig:
        cols = [
            ExpandedColumn("doc_id", "string"),
            ExpandedColumn("tokens", "json"),
            ExpandedColumn("n_tok", "long"),
            ExpandedColumn("source", "string"),
        ] + [ExpandedColumn(c, "string") for c in extra_string_cols]
        return ExpandConfig(
            json_column_name="payload",
            expanded_columns=tuple(cols),
            # payload kept through dedup so new-key detection + post-hoc
            # extraction of evolved columns run on the (small) deduped set
            keep_expanding_json_column=True,
            stop_on_invalid_record=False,
            malformed_json_policy="invalid_record",
        )

    def _detect_new_keys(self, deduped: DataFrame) -> List[str]:
        """Top-level payload keys not yet in the table schema (additive
        evolution trigger). JVM-side json_object_keys + explode + distinct —
        run over the *deduped survivors* (the rows that will actually be
        applied), which is both cheaper than a full-slice scan and the right
        semantics: only applied data evolves the schema."""
        known = set(self.table.schema().fieldNames()) | _BASE_KEYS
        rows = (
            deduped.select(
                F.explode_outer(F.json_object_keys("payload")).alias("k")
            )
            .filter(F.col("k").isNotNull())
            .distinct()
            .collect()
        )
        return sorted({r["k"] for r in rows} - known)

    # ---------------------------------------------------------- epoch apply
    def apply_epoch(self, epoch: int) -> EpochMetrics:
        t0 = time.time()
        m = EpochMetrics(epoch=epoch)
        if epoch <= self.last_committed_epoch():
            m.skipped = True
            m.wall_sec = time.time() - t0
            self._append_lineage(m)
            return m

        changes = self.spark.read.parquet(self.changes_path).filter(
            F.col("epoch") == epoch
        )

        # columns evolved by PREVIOUS epochs come from the table schema and
        # are expanded in the main pass
        extra_cols = [
            f.name for f in self.table.schema().fields if f.name not in _BASE_KEYS
        ]

        cfg = self._expand_config(extra_cols)
        expanded = expand_json(changes, cfg, mode="auto")
        # JSON-text tokens -> array<int32>; a non-array here would have
        # already been dropped by the json-cast invalid channel
        typed = expanded.select(
            F.col(self.order),
            F.col("op"),
            F.col("payload"),
            F.col("doc_id"),
            F.from_json("tokens", T.ArrayType(T.IntegerType())).alias("tokens"),
            F.col("n_tok").cast("int").alias("n_tok"),
            F.col("source"),
            *[F.col(c) for c in extra_cols],
        ).filter(F.col("doc_id").isNotNull())

        cached = lww_dedup(
            typed, key=self.key, order=self.order, strategy=self.lww_strategy
        ).cache()
        deduped = cached
        try:
            if self.auto_evolve:
                # THIS epoch's brand-new keys: detected on the deduped
                # survivors, values pulled post-hoc from the kept payload
                new_keys = self._detect_new_keys(deduped)
                if new_keys:
                    self.table.evolve_add_columns(
                        [T.StructField(k, T.StringType(), True) for k in new_keys]
                    )
                    m.evolved_columns = new_keys
                    for k in new_keys:
                        deduped = deduped.withColumn(
                            k, F.get_json_object("payload", f"$.{k}")
                        )
            deduped = deduped.drop("payload")
            if self.collect_metrics:
                agg = changes.select(
                    F.count("*").alias("rows_in"),
                    F.min(self.order).alias("lo"),
                    F.max(self.order).alias("hi"),
                ).collect()[0]
                m.rows_in = agg["rows_in"]
                m.start_offset = agg["lo"]
                m.end_offset = agg["hi"]
                by_op = {
                    r["op"]: r["n"]
                    for r in deduped.groupBy("op")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
                m.deletes = by_op.get("D", 0)
                m.upserts = sum(v for k, v in by_op.items() if k != "D")
                valid = typed.count()
                m.invalid = m.rows_in - valid
                m.dedup_dropped = valid - (m.deletes + m.upserts)

            result = self.table.merge(
                deduped.withColumn("__del", F.col("op") == "D").drop(
                    "op", self.order
                ),
                epoch=epoch,
                delete_col="__del",
            )
            m.skipped = result.get("skipped", False)
            m.buckets_touched = result.get("buckets_touched", 0)
        finally:
            cached.unpersist()
        m.wall_sec = time.time() - t0
        self._append_lineage(m)
        return m

    # ------------------------------------------------------------------ run
    def available_epochs(self) -> List[int]:
        df = self.spark.read.parquet(self.changes_path)
        return sorted(
            r["epoch"] for r in df.select("epoch").distinct().collect()
        )

    def run(self, max_epochs: Optional[int] = None) -> List[EpochMetrics]:
        """Replay all uncommitted epochs in order. Resumable: starts after
        the table's last committed epoch."""
        done = self.last_committed_epoch()
        todo = [e for e in self.available_epochs() if e > done]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        return [self.apply_epoch(e) for e in todo]
