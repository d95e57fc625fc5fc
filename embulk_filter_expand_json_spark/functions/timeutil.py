"""Session-timezone-independent event-time conversions.

TIMESTAMP_NTZ stores a wall clock with no zone. Every operator here needs
either the wall clock as integer epoch-micros (oracle-comparable) or as a
pinned TIMESTAMP instant (Spark watermarks/windows require an instant).

The obvious-looking ``to_utc_timestamp(ntz, 'UTC')`` is WRONG: Spark first
implicitly casts NTZ -> TIMESTAMP using the SESSION timezone, so the
result shifts with spark.sql.session.timeZone (verified on Spark 4.1.2:
+5h under America/New_York). ``timestampdiff(MICROSECOND, ntz_epoch, ts)``
is pure wall-clock arithmetic — no zone involved at any step — and
``timestamp_micros`` of it reconstructs the instant whose UTC rendering
equals the stored wall clock. Both stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def _is_ntz(df: DataFrame, ts_col: str) -> bool:
    return df.schema[ts_col].dataType.typeName() == "timestamp_ntz"


def wall_epoch_us(df: DataFrame, ts_col: str):
    """Integer epoch-micros of the event time. For TIMESTAMP_NTZ this is
    the wall clock as-if-UTC (matches DuckDB's epoch_us(TIMESTAMP));
    for TIMESTAMP it is the instant's micros."""
    if _is_ntz(df, ts_col):
        return F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def utc_instant(df: DataFrame, ts_col: str):
    """The event time as a TIMESTAMP instant, session-tz-independent:
    NTZ wall clocks are pinned as-if-UTC (what watermarks and window
    functions need to be deterministic); TIMESTAMP passes through."""
    if _is_ntz(df, ts_col):
        return F.timestamp_micros(wall_epoch_us(df, ts_col))
    return F.col(ts_col)
