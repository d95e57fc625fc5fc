"""Event-time windowed aggregation for Structured Streaming.

The watermark + tumbling-window aggregation the brief's streaming story
calls for, over the same events-table shape the expansion operator feeds
(expand props -> sessionize/window downstream):

- ``windowed_counts`` declares the agg once; it runs identically on a
  batch DataFrame (degenerate case: watermark is a no-op) and on a
  readStream source.
- Watermark semantics: in UPDATE/APPEND mode, events later than
  ``watermark`` behind the max seen event time are dropped from their
  (already finalized) windows — pinned by tests/test_streaming_windowed.py
  with a two-batch file feed.
- COMPLETE mode re-emits the full window table each trigger, so after an
  availableNow run its final output equals the batch GROUP BY — that is
  the oracle bridge used by the ``streaming_windowed_agg`` contract query.

Scale notes (100 TB/day stream): state size is O(open windows × keys) —
bounded by the watermark horizon, not the stream length; the shuffle key
is (window, key) so partial aggregation happens map-side per micro-batch.
COMPLETE mode is the small-cardinality convenience (the result table here
is hours × event_types); high-cardinality keys go APPEND into a keyed
sink, which emits each window exactly once when the watermark closes it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.timeutil import utc_instant as _event_time
# (watermarks require a TIMESTAMP instant; see timeutil for why the naive
# to_utc_timestamp pinning is session-timezone-DEPENDENT and wrong)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """(window, *keys, n_events) tumbling-window counts.

    On a streaming DataFrame the watermark bounds state and late data; on
    a batch DataFrame the same plan runs with the watermark omitted (it
    would be a no-op there anyway).
    """
    src = events.withColumn("__evt", _event_time(events, ts_col))
    if src.isStreaming:
        src = src.withWatermark("__evt", watermark)
    return src.groupBy(F.window("__evt", window), *keys).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def session_windows(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native streaming sessionization: ``F.session_window`` merges a
    user's events whose gaps are under ``gap_minutes`` — the Structured
    Streaming twin of operators/sessions.sessionize (state lives in the
    session-window store, merged incrementally across micro-batches,
    evicted once the watermark passes a session's close).

    Boundary semantics: session_window closes at a STRICT < gap while the
    batch sessionizer merges at <= gap; the two differ only for events
    exactly gap apart (micro-timestamped data makes that measure-zero —
    asserted against the batch sessionizer in tests).

    Output: (user_id, start_us, last_us, n_events) with last_us the last
    event's time (window end minus the gap), as integer epoch micros.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    src = events.withColumn("__evt", _event_time(events, ts_col))
    if src.isStreaming:
        src = src.withWatermark("__evt", watermark)
    agg = src.groupBy(
        F.session_window("__evt", f"{int(gap_minutes)} minutes"),
        user_col,
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        F.col(user_col),
        F.unix_micros(F.col("session_window.start")).alias("start_us"),
        (F.unix_micros(F.col("session_window.end")) - F.lit(gap_us)).alias(
            "last_us"
        ),
        "n_events",
    )


def window_start_us(df: DataFrame) -> DataFrame:
    """Flatten the window struct to integer epoch-micros of the start —
    hash-comparable across engines (see operators/sessions._epoch_us)."""
    other = [c for c in df.columns if c != "window"]
    return df.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"), *other
    )
