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
- Skew: a single pathological user serializes one partition under plain
  hashing. ``session_stats_chunked`` implements the standard mitigation:
  sessionize within (user, time-chunk) — the hot user's events spread over
  #chunks partitions — then stitch boundary sessions in a second pass over
  per-chunk SESSION SUMMARIES (tiny: one row per session, not per event).
  Proven equal to the plain sessionizer by test and by sharing its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.timeutil import wall_epoch_us as _epoch_us


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
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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


def session_stats_chunked(
    events: DataFrame,
    gap_minutes: int = 30,
    chunk_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Skew-resistant sessionization: identical output to
    ``session_stats`` (same columns, same numbering), different shuffle
    shape for hot keys.

    Pass 1 partitions the EVENT shuffle by (user, time-chunk) — a user with
    10^9 events spreads across #chunks tasks instead of serializing one —
    and reduces each chunk to per-session summaries (the groupBy reuses the
    window's partitioning: [user, chunk] is a subset of the grouping keys,
    so pass 1 is one exchange). Pass 2 re-sessionizes the SUMMARIES by user
    with the interval form of the gap rule (new session when
    start - prev_end > gap): sessions are disjoint, time-ordered intervals,
    so merging chains — a session spanning many chunk boundaries — falls
    out of the same running-sum construction. Pass 2's shuffle carries one
    row per per-chunk session, orders of magnitude below event cardinality.

    Both passes use strict > on the gap, so the boundary semantics (and
    hence the oracle) are exactly the plain sessionizer's.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    chunk_us = int(chunk_hours) * 3600 * 1_000_000
    ts_us = _epoch_us(events, ts_col)
    ev = events.select(
        F.col(user_col),
        ts_us.alias("__t_us"),
        F.col(order_col).alias("__ord"),
        (ts_us / F.lit(chunk_us)).cast("long").alias("__chunk"),
    )
    w = Window.partitionBy(user_col, "__chunk").orderBy("__t_us", "__ord")
    prev = F.lag("__t_us").over(w)
    is_new = (prev.isNull() | (F.col("__t_us") - prev > gap_us)).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ev.withColumn("__seq", F.sum(is_new).over(run))
    summaries = local.groupBy(user_col, "__chunk", "__seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__t_us").alias("start_us"),
        F.max("__t_us").alias("end_us"),
    )
    w2 = Window.partitionBy(user_col).orderBy("start_us", "end_us")
    prev_end = F.lag("end_us").over(w2)
    is_new2 = (
        prev_end.isNull() | (F.col("start_us") - prev_end > gap_us)
    ).cast("long")
    run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stitched = summaries.withColumn("session_seq", F.sum(is_new2).over(run2))
    return stitched.groupBy(user_col, "session_seq").agg(
        F.sum("n_events").alias("n_events"),
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        (F.max("end_us") - F.min("start_us")).alias("duration_us"),
    )
