"""Custom stateful streaming operator: per-user event-type transitions.

``applyInPandasWithState`` demo with real semantics the built-in streaming
aggregations cannot express: emitting (prev_event_type -> event_type)
transition rows requires LAG across micro-batch boundaries, i.e. state
carrying each user's latest event between triggers. (Windowed counts need
no such state; dropDuplicates covers keyed dedup; this is genuinely the
custom-stateful tier of the brief.)

Contract: within a micro-batch a user's events are sorted by
(event time, order col); across micro-batches the source must deliver a
user's events in non-decreasing event-time order (file feeds split by time
range do — tests/test_streaming_windowed.py feeds exactly that). The
contract is ENFORCED: an event older than the already-consumed state
raises instead of silently corrupting emitted transitions. Under the
contract the emitted transition multiset equals the batch
LAG-over-window oracle, which is how the contract query hash-verifies it.

Scale notes: state is ONE row (ts_us, order, type) per user — O(users),
not O(events); each trigger shuffles only that batch's rows on the user
key (the same partitioning the batch sessionizer uses); per-group work is
a pandas sort of the user's in-batch slice (Arrow-transferred, no per-row
Python).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import _event_time

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("event_type", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_order", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _emit_transitions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        return
    batch = batch.sort_values(["__evt_us", "__order"], kind="stable")
    types = batch["__etype"].tolist()
    if state.exists:
        last_us, last_order, last_type = state.get
        first = batch.iloc[0]
        if (int(first["__evt_us"]), int(first["__order"])) < (
            int(last_us),
            int(last_order),
        ):
            # the cross-batch ordering contract (module docstring) was
            # violated: an event older than already-consumed state arrived,
            # so the transitions already emitted for this user are wrong —
            # fail loudly instead of silently corrupting the output
            raise ValueError(
                f"transitions_stateful: user {key[0]!r} received event at "
                f"({int(first['__evt_us'])}, {int(first['__order'])}) older "
                f"than consumed state ({int(last_us)}, {int(last_order)})"
            )
        prevs = [last_type] + types[:-1]
    else:
        prevs = [None] + types[:-1]
    tail = batch.iloc[-1]
    state.update((int(tail["__evt_us"]), int(tail["__order"]), tail["__etype"]))
    out = pd.DataFrame(
        {
            "user_id": key[0],
            "prev_type": pd.Series(prevs, dtype="object"),
            "event_type": types,
        }
    )
    yield out[out["prev_type"].notna()]


def transitions_stateful(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """(user_id, prev_type, event_type) — one row per event that has a
    same-user predecessor, lag state maintained across micro-batches."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(_event_time(stream, ts_col)).alias("__evt_us"),
        F.col(order_col).cast("long").alias("__order"),
        F.col(type_col).alias("__etype"),
    ).filter(
        # a NULL event time has no position in the per-user order — drop it
        # here (NaN would poison the pandas sort and the state update)
        F.col("__evt_us").isNotNull() & F.col("__order").isNotNull()
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
