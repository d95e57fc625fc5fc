"""As-of (temporal lookup) join — for each left row, the single right row
with the same key and the nearest timestamp at-or-before it (``backward``,
the default) or at-or-after it (``forward``).

Spark has no native ASOF JOIN (SPARK-22947 is open); the naive encodings
are a range join (quadratic candidate explosion) or a per-key
``collect_list`` + UDF (driver-shaped, Python in the hot path). This
implements the classic single-shuffle union-merge instead — the algorithm
Flint (Two Sigma's Spark time-series library) and pandas ``merge_asof``
use, expressed in pure Catalyst:

1. Tag and union the two sides (right rows carry their payload packed in
   ONE nullable struct column; left rows carry a NULL struct).
2. One window per key ordered by (time, is_left): ``last(payload,
   ignorenulls=true)`` over ``rowsBetween(unboundedPreceding, current)``
   gives every left row the payload of the nearest preceding right row.
   Right rows sort BEFORE left rows at equal timestamps, so exact-time
   matches are included (``merge_asof(allow_exact_matches=True)``).
3. Keep the left rows; unpack the matched struct; apply the optional
   ``tolerance`` bound.

Scale: exactly ONE hash exchange (on the key) and one sort — the same
cost as a plain equi-join of the two sides, independent of how many right
rows precede each left row. No join explosion, no per-key state on the
driver, and whole-stage codegen covers the window's input. Skewed keys
cost what any window over that key costs; salting does not apply (the
window is order-dependent), so a pathologically hot key should be
pre-split upstream by time range if needed.

Semantics notes (documented contract):
- NULL keys: one logical key, matching this engine's null-safe LWW/MERGE
  convention (a NULL-keyed left row can match a NULL-keyed right row).
  ANSI/DuckDB ``ASOF JOIN ... ON l.k = r.k`` never matches NULL keys —
  filter them upstream when oracle parity matters.
- Rows with a NULL left time never match; right rows with a NULL time are
  dropped (they can never win a comparison).
- If several right rows tie on (key, time), one of them wins
  deterministically only if the caller deduplicates first (the usual
  as-of contract: the right side is a state/quote table keyed by time).

The reference (embulk-filter-expand_json) has no join operator at all —
this belongs to the engine layer the north_rule adds (CDC: enrich an
event stream with the dimension state that was current when the event
happened).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the matched ``right``
    row's time and payload columns (NULL when no right row qualifies).

    Parameters
    ----------
    on : key column name (or list of names), present on both sides.
    left_time / right_time : event-time columns; ``right_time`` defaults
        to ``left_time``. Types must be mutually comparable.
    direction : ``backward`` (right_time <= left_time, nearest wins) or
        ``forward`` (right_time >= left_time, nearest wins).
    tolerance : optional maximum |left_time - matched_time|. In the time
        column's natural units — SECONDS for timestamps (cast to double),
        the raw difference for numeric time columns.
    suffix : appended to right-side output columns that collide with a
        left column name (the matched time column usually does).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    key_cols: List[str] = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    for k in key_cols:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} missing from one side")
    if left_time not in left.columns:
        raise ValueError(f"left_time {left_time!r} not in left")
    if rt not in right.columns:
        raise ValueError(f"right_time {rt!r} not in right")

    def out_name(c: str) -> str:
        return c + suffix if c in left.columns else c

    rval_cols = [c for c in right.columns if c not in key_cols and c != rt]
    matched_time = out_name(rt)

    # right payload packed as one struct: null exactly for left rows, so
    # last(ignorenulls) carries the WHOLE matched row (a per-column
    # ignorenulls would wrongly skip over a matched row's legitimate NULL
    # field back to an older row's value)
    payload = F.struct(
        F.col(rt).alias(matched_time),
        *[F.col(c).alias(out_name(c)) for c in rval_cols],
    )
    left_schema = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))

    r2 = right.filter(F.col(rt).isNotNull()).select(
        *[F.col(k).cast(left_schema[k]).alias(k) for k in key_cols],
        F.col(rt).cast(left_schema[left_time]).alias("__t"),
        *[
            F.lit(None).cast(left_schema[c]).alias(c)
            for c in left.columns
            if c not in key_cols
        ],
        F.lit(False).alias("__is_left"),
        payload.alias("__r"),
    )
    l2 = left.select(
        *key_cols,
        F.col(left_time).alias("__t"),
        *[c for c in left.columns if c not in key_cols],
        F.lit(True).alias("__is_left"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
    )

    if direction == "backward":
        # asc: at equal time the right row (is_left=false) precedes the
        # left row, so exact-time matches are visible to last()
        order = [F.asc_nulls_first("__t"), F.asc("__is_left")]
    else:
        order = [F.desc_nulls_last("__t"), F.asc("__is_left")]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)

    out = (
        r2.unionByName(l2.select(*r2.columns))
        .withColumn("__m", matched)
        .filter(F.col("__is_left"))
    )

    valid = F.col(left_time).isNotNull() & F.col("__m").isNotNull()
    if tolerance is not None:
        delta = F.col(left_time).cast("double") - F.col(
            f"__m.{matched_time}"
        ).cast("double")
        if direction == "forward":
            delta = -delta
        valid = valid & (delta <= F.lit(float(tolerance)))
    m = F.when(valid, F.col("__m"))

    return out.select(
        *key_cols,
        *[c for c in left.columns if c not in key_cols],
        m[matched_time].alias(matched_time),
        *[m[out_name(c)].alias(out_name(c)) for c in rval_cols],
    )
