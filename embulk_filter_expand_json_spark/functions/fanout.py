"""Scale-adaptive input fan-out for compute-heavy map stages.

Shingling, window-hashing, JSON expansion and LWW's map side all run in
the SCAN stage (before the first exchange), so their parallelism equals
the input split count. A small input is often one parquet file with one
row group — a single task then pays the whole per-row cost while every
other core idles (the "unsplittable input" skew of the optimization
playbook; remedy: repartition immediately after the read). Round-robin
repartition to the default parallelism ONLY when the scan has fewer
splits than cores: at real (multi-TB) scale the scan already has orders
of magnitude more splits than cores and this is a no-op, so nothing here
is tuned to the small case. The moved bytes are bounded by the
undersized input itself (< cores x split size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """``min_bytes``: additionally require the input's estimated size to
    reach this many bytes before fanning out. Zero (default) fans out on
    the split count alone — right for operators whose per-row compute
    dwarfs the shuffle (shingling, K-hash signatures). Callers whose
    per-row work is light relative to moving the bytes (e.g. the CDC
    epoch loop) pass a threshold around one split's worth: below it a
    couple of tasks finish faster than the extra exchange costs; above
    it the idle cores win. When the optimizer has no size estimate the
    fan-out is skipped (conservative)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; fan-out is optional
        return df
    if n >= target:
        return df
    if min_bytes > 0:
        try:
            size = int(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        except Exception:  # pragma: no cover — stats unavailable
            return df
        if size < min_bytes:
            return df
    return df.repartition(target)
