"""Gap-based sessionization over an event stream table.

A session is a maximal run of a user's events where consecutive events
(in event time) are no more than ``gap`` apart — the standard web-analytics
sessionization the reference's downstream consumers run after expansion
(the expanded `props` of an events table is exactly this table's shape).

Scale design (100 TB):
- ONE hash shuffle on the user column; the session boundary (lag) and the
  running session counter are both windows over that same partitioning, so
  they execute in a single sort within each partition.
- ``session_stats`` groups by (user, session_seq). HashPartitioning(user)
  already co-locates every (user, session) group — [user] is a subset of
  the grouping keys — so Catalyst satisfies the aggregation's
  ClusteredDistribution with NO second exchange (asserted in
  tests/test_plan_quality.py).
- Timestamps are compared as integer epoch micros (unix_micros), never as
  intervals: integer arithmetic is timezone-independent and oracle-exact.
- Skew: a single pathological user serializes one partition. The gap rule
  only needs the user's own timeline, so the standard mitigation is to
  pre-split such users by coarse time range and stitch boundary sessions;
  at the synthetic data's fan-out (events/user ~ uniform) plain hashing
  holds to the design scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch-micros of a timestamp column, timezone-independent.

    TIMESTAMP_NTZ carries a wall clock with no zone: pin it to UTC
    (to_utc_timestamp with a literal zone ignores the session timezone),
    matching DuckDB's epoch_us(TIMESTAMP) semantics exactly. Plain
    TIMESTAMP is already an instant."""
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        return F.unix_micros(F.to_utc_timestamp(F.col(ts_col), "UTC"))
    return F.unix_micros(F.col(ts_col))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Events + ``session_seq`` (1-based per user, in event-time order).

    New session when the previous event of the same user is more than
    ``gap_minutes`` older (strict >), or there is none. ``order_col``
    breaks equal-timestamp ties so the numbering is total-order
    deterministic.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    ts_us = _epoch_us(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_us = F.lag(ts_us).over(w)
    is_new = (prev_us.isNull() | (ts_us - prev_us > gap_us)).cast("long")
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): event count, start/end epoch-micros,
    duration. Integer-only outputs so the result is hash-comparable across
    engines (no float summation order).
    """
    s = sessionize(events, gap_minutes, user_col, ts_col, order_col)
    ts_us = _epoch_us(events, ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
    )
