"""Last-writer-wins dedup — the CDC apply stage's core operator (north_rule).

Given a change batch with a key column and a strictly-ordered offset column,
keep only each key's latest row. Three physical strategies, all producing
identical results (tested against each other and the DuckDB oracle):

- ``window``   — the textbook row_number() OVER (PARTITION BY key ORDER BY
                 offset DESC) = 1. One full shuffle + per-partition sort;
                 hot keys serialize on one task.
- ``agg``      — groupBy(key).agg(max_by(struct(*), offset)). Spark plans
                 a *partial* aggregate before the shuffle, so a hot key is
                 combined map-side down to one row per input partition —
                 naturally skew-resistant and cheaper than the window's
                 sort. Preferred at scale; the default.
- ``salted``   — explicit two-stage window for the north_rule's salting
                 requirement: stage 1 dedups within (key, salt) groups where
                 salt = pmod(xxhash64(offset), S), stage 2 dedups the S
                 survivors per key. Correct because max is associative:
                 the true last writer wins its salt group, then the final
                 window. Use when a window (not agg) is required but keys
                 are skewed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "log_offset",
    strategy: str = "agg",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep each key's row with the greatest ``order`` value.

    ``order`` values must be unique per key (log offsets are globally
    unique), so all strategies are deterministic.
    """
    if strategy == "agg":
        others = [c for c in df.columns if c != key]
        packed = df.groupBy(key).agg(
            F.max_by(F.struct(*[F.col(c) for c in others]), F.col(order)).alias("__r")
        )
        return packed.select(key, *[F.col(f"__r.{c}").alias(c) for c in others])

    if strategy == "window":
        w = Window.partitionBy(key).orderBy(F.desc(order))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    if strategy == "salted":
        salt = F.pmod(F.xxhash64(F.col(order)), F.lit(salt_buckets))
        w1 = Window.partitionBy(key, "__salt").orderBy(F.desc(order))
        stage1 = (
            df.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        w2 = Window.partitionBy(key).orderBy(F.desc(order))
        return (
            stage1.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__salt")
        )

    raise ValueError(f"unknown strategy {strategy!r}")
