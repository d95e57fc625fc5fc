"""Deterministic train/val/test splitting for training-data pipelines.

``hash_split`` assigns each row a split label from a salted md5 of its id:

- **Deterministic & engine-portable**: md5 is bit-identical everywhere
  (the DuckDB oracle reproduces the assignment exactly), unlike
  ``DataFrame.randomSplit`` (partition-dependent sampling) or xxhash64
  (Spark-specific seeding). Re-running at any partitioning, cluster size,
  or engine yields the same split — the property a reproducible training
  corpus actually needs.
- **Zero shuffle**: a pure projection under whole-stage codegen; at 100 TB
  the split is free compared to the write it feeds.
- **Stable under appends**: a document's split never changes when other
  documents are added or removed (assignment depends only on its own id
  and the salt).

The first 8 hex chars of md5(salt || ':' || id) become a number in
[0, 2^32); split boundaries are cumulative weights over a 10^6 grid
(integer arithmetic — no float boundary drift between engines).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

_GRID = 1_000_000


def _boundaries(weights: Mapping[str, float]) -> Sequence[Tuple[str, int]]:
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    acc = 0.0
    out = []
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {name!r}")
        acc += w / total
        out.append((name, min(int(round(acc * _GRID)), _GRID)))
    out[-1] = (out[-1][0], _GRID)  # close the last interval exactly
    return out


def split_bucket(id_col: Column, salt: str = "split42") -> Column:
    """Integer bucket in [0, 10^6) from the salted md5 of the id."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % _GRID


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split42",
    out_col: str = "split",
) -> DataFrame:
    """df + a ``split`` label column ('train'/'val'/'test' by default,
    80/10/10). Weights are normalized; ordering of the mapping defines the
    bucket layout, so pass the same mapping to reproduce a split."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    for name, hi in _boundaries(weights):
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr)
