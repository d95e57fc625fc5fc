"""Multi-column Z-order clustering for data skipping — the Delta Lake
``OPTIMIZE ... ZORDER BY (c1, c2)`` analog for SnapTable's clustered
compaction.

Single-column clustering (``compact(cluster_by="ts")``) range-splits each
hash bucket so per-file min/max stats are narrow on ONE dimension.
Z-ordering interleaves the bits of several dimensions' quantile-bucket
ranks into one scalar, so a range split on that scalar keeps every file's
value range narrow on EVERY participating column at once — ``read_where``
then prunes files for predicates on any of them. This is how a 100 TB
table serves selective scans on two or three ad-hoc dimensions without
maintaining one physical sort order per dimension.

Spark-first mechanics (everything row-scale stays in Catalyst codegen):

1. **Quantile cut points per column, via a bounded sample.** One small
   driver-side job collects ~``sample_rows`` values per column and takes
   ``2**bits - 1`` evenly spaced order statistics. This mirrors what
   Spark's own RangePartitioner (and Delta's range_partition_id) does:
   the cuts only decide FILE BOUNDARIES, so sampling error shifts file
   edges slightly — it can never affect correctness (read_where always
   re-applies the exact predicate). Sampling works uniformly for any
   orderable type — ints, doubles, dates, strings — where approxQuantile
   would restrict to numerics.
2. **Rank = predecessor count against the cuts array**, computed as
   ``size(filter(lit(cuts), c -> col >= c))`` — a fold over a ~63-element
   literal array inside whole-stage codegen; no shuffle, no window, no
   UDF. NULLs rank 0 (first, like Spark's NULLS FIRST ordering).
3. **Bit interleave in Catalyst**: for k columns of b bits each, bit i of
   column j lands at position ``i*k + j`` of the z-value (shiftleft /
   shiftright / bitwise AND on longs). k*b is capped at 63 to stay in a
   signed long.

The z-value is a TRANSIENT layout key: it exists only during the rewrite
(repartitionByRange + sortWithinPartitions) and is dropped before write —
the table schema never sees it. Skipping then happens through the
ordinary ``stats_columns`` min/max machinery; there is nothing special to
read back.

The reference (embulk-filter-expand_json) has no storage layer; this
belongs to the engine layer the north_rule adds. Public-knowledge basis:
Morton order (Z-order curves) and the Delta OPTIMIZE ZORDER design as
publicly documented.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(ranks: Sequence[int], bits: int) -> int:
    """Pure-Python Morton interleave (the test oracle for the Catalyst
    expression): bit i of ranks[j] -> bit i*k + j of the result."""
    z = 0
    k = len(ranks)
    for i in range(bits):
        for j, r in enumerate(ranks):
            z |= ((r >> i) & 1) << (i * k + j)
    return z


def _cuts_for(
    df: DataFrame, col: str, n_cuts: int, sample_rows: int, total_rows: int
) -> list:
    """~n_cuts evenly spaced order statistics of ``col`` from a bounded
    UNIFORM sample (Bernoulli at a fraction derived from the table's row
    count — a position-based limit() would bias the cuts toward the first
    files, catastrophically so when re-clustering an already-clustered
    table whose early files hold the low values). NULLs are excluded —
    they rank 0 by construction. Returns a sorted, deduplicated list; may
    be shorter than n_cuts on low-cardinality columns (fewer distinct
    file ranges then — harmless)."""
    frac = min(1.0, (sample_rows * 1.2) / max(total_rows, 1))
    vals = sorted(
        r[0]
        for r in df.select(col)
        .where(F.col(col).isNotNull())
        .sample(withReplacement=False, fraction=frac, seed=42)
        .collect()
    )
    if not vals:
        return []
    step = max(len(vals) // (n_cuts + 1), 1)
    cuts = sorted({vals[i] for i in range(step, len(vals), step)})
    return cuts[:n_cuts]


def rank_against_cuts(col: Column, cuts: list) -> Column:
    """Quantile-bucket rank of ``col``: how many cut points it is >= —
    a codegen fold over a literal array. NULL comparisons are filtered
    out by higher-order filter semantics, so NULLs rank 0."""
    if not cuts:
        return F.lit(0).cast("long")
    return F.size(
        F.filter(F.array(*[F.lit(c) for c in cuts]), lambda c: col >= c)
    ).cast("long")


def z_value_column(
    df: DataFrame,
    cols: List[str],
    bits: int = 6,
    sample_rows: int = 20_000,
) -> Tuple[Column, dict]:
    """Z-value Column over ``cols`` for ``df``, plus the per-column cut
    points used (for observability/tests). ``bits`` quantile-bucket bits
    per column; k*bits must fit a signed long (<= 63)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use plain "
                         "cluster_by for one")
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} columns x {bits} bits = {k * bits} z-bits "
                         "> 63 (signed long): lower bits or columns")
    n_cuts = (1 << bits) - 1
    # one count job sizes the sample fraction for every column; at
    # compaction time (the only caller) the full-state rewrite dwarfs it
    total = df.count()
    cuts = {c: _cuts_for(df, c, n_cuts, sample_rows, total) for c in cols}
    # Scale every rank to the FULL bit width: a low-cardinality column
    # (e.g. 8 distinct values -> 7 cuts -> ranks 0..7) would otherwise
    # populate only its LOW bit positions, letting a high-cardinality
    # co-column's high bits dominate the z-order entirely — files end up
    # clustered on one dimension and the other gets zero skipping (found
    # by the contract gate on the 8-value `source` column).
    ranks = [
        (
            F.floor(
                rank_against_cuts(F.col(c), cuts[c])
                * F.lit(n_cuts)
                / F.lit(len(cuts[c]))
            ).cast("long")
            if cuts[c]
            else F.lit(0).cast("long")
        )
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z, cuts
