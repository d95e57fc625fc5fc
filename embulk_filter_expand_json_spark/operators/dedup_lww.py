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
- ``keyjoin``  — min-shuffle variant for WIDE rows (token arrays): only
                 (key, offset) pairs — ~16 bytes/row — go through the
                 group-by shuffle; the winning full rows are then selected
                 by an equi-join on (key, offset), which AQE turns into a
                 broadcast hash join whenever the winner set is small, so
                 the wide payload never shuffles at all. Order-of-magnitude
                 fewer shuffle bytes than ``agg``/``window`` when the
                 payload dominates row width — the default for the CDC
                 pipeline.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def detect_hot_keys(
    df: DataFrame,
    key: str = "doc_id",
    sample_fraction: float = 0.05,
    hot_multiplier: float = 50.0,
    max_keys: int = 100,
    seed: int = 42,
) -> List:
    """Sampled hot-key detection (north_rule: 'detect hot doc_id via
    sampled counts'). Returns keys whose sampled frequency exceeds
    hot_multiplier x the mean key frequency — the candidates that would
    serialize a window/shuffle partition. Cost: one pass over a
    sample_fraction sample with a partial-aggregated groupBy."""
    counts = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(key)
        .count()
    )
    stats = counts.agg(
        F.avg("count").alias("mean"), F.count("*").alias("n")
    ).collect()[0]
    if not stats["n"]:
        return []
    threshold = max(stats["mean"] * hot_multiplier, 2.0)
    rows = (
        counts.filter(F.col("count") >= threshold)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


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

    ``strategy='auto'`` picks per data shape: sampled hot-key detection
    (``detect_hot_keys``) routes skewed inputs to the two-stage salted
    window and uniform inputs to the plain agg.
    """
    if strategy == "auto":
        strategy = "salted" if detect_hot_keys(df, key=key) else "agg"
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

    if strategy == "keyjoin":
        # explicit broadcast: the winner set is (key, offset) pairs — tiny
        # next to the wide rows. Without the hint AQE may pick a sort-merge
        # join and shuffle the wide side, defeating the whole point. For
        # winner sets too big to broadcast, use strategy='agg' instead.
        winners = df.groupBy(key).agg(F.max(order).alias(order))
        return df.join(F.broadcast(winners), on=[key, order], how="left_semi")

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
