"""Temporal enrichment: join an event stream to the dimension state that
was CURRENT when each event happened — the classic CDC consumer question
("what did this doc's row look like at the moment the event fired?"),
answered without materializing a snapshot per event time.

Composition of two verified parts:

1. The SnapTable **change data feed** (``read_changes``) — every
   per-commit after-image row, cost proportional to changes, never to
   table size. Each change row is stamped with its commit's wall-clock
   time from the (tiny, broadcast) commit history.
2. The **as-of join** (operators/asof.py) — one key-hash exchange,
   backward direction: each event matches the latest change row for its
   key at-or-before the event time. A matched ``delete`` change means the
   key did not exist at that instant — the payload columns null out, like
   an outer join miss (and unlike naive "join latest", which would
   resurrect deleted rows).

Scale: the feed is a file union (no shuffle), the history broadcast is
commit-count-sized, and the as-of join costs one exchange over
events ∪ changes. Nothing scans the table's base files at all. The limit
is the feed's retention window (``changelog_keep``): events older than
the earliest retained change see NULLs for keys whose last change was
trimmed — same contract as any CDF consumer (restart from a snapshot if
you need deeper history).

The reference (a per-record filter) has no table/time notion; this
belongs to the engine layer the north_rule adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.asof import asof_join
from .snaptable import SnapTable


def enrich_as_of(
    events: DataFrame,
    table: SnapTable,
    on: str,
    event_time: str,
    since_version: int = 0,
) -> DataFrame:
    """Every ``events`` row plus the ``table`` columns as of that row's
    ``event_time`` (epoch seconds, compared against commit wall-clock
    times). Keys with no version at that instant — never inserted yet,
    or deleted by the matched commit — carry NULL payload columns.

    ``on`` must be the table's merge key (one live row per key per
    commit, the as-of right-side uniqueness contract)."""
    man = table.manifest()
    if on != man["key"]:
        raise ValueError(
            f"enrich key {on!r} must be the table's merge key {man['key']!r}"
        )
    changes = table.read_changes(since_version)
    history = [
        (h["version"], float(h["committed_at"]))
        for h in table.history()
        if h.get("committed_at") is not None
    ]
    commit_ts = F.create_map(
        *[F.lit(x) for vt in history for x in vt]
    )  # version -> wall-clock; commit-count-sized, folds into the plan
    payload_cols = [
        f.name for f in table.schema().fields if f.name != on
    ]
    right = changes.select(
        F.col(on),
        commit_ts[F.col("_commit_version")].alias("__commit_ts"),
        F.col("_change_type"),
        *payload_cols,
    )
    for reserved in ("__commit_ts", "_change_type"):
        if reserved in events.columns:
            raise ValueError(f"events already has a {reserved!r} column")
    out = asof_join(
        events,
        right,
        on=on,
        left_time=event_time,
        right_time="__commit_ts",
    )

    # asof_join suffixes right-side columns that collide with event columns
    def oname(c: str) -> str:
        return c + "_r" if c in events.columns else c

    # a matched delete == the key did not exist at that instant
    alive = F.col("_change_type").isNotNull() & (
        F.col("_change_type") != F.lit("delete")
    )
    return out.select(
        *events.columns,
        F.col("__commit_ts").alias("as_of_commit_ts"),
        *[
            F.when(alive, F.col(oname(c))).alias(oname(c))
            for c in payload_cols
        ],
    )
