"""Canned WAP audits — composable checks for ``CdcPipeline.run_wap``.

Each factory returns ``audit(branch_table) -> True`` that RAISES
:class:`AuditFailed` with a specific reason instead of returning False,
so the operator sees WHY publication was blocked (run_wap drops the
branch and propagates). All checks are single-aggregate Spark jobs over
the branch table — cost ~ one scan each, trivially parallel at any
table size; compose with :func:`all_of` to run several per cycle.

This is the audit half of write-audit-publish (Iceberg WAP / what
dbt-style pipelines call post-hooks): the staged-but-unpublished branch
is the only safe place these can run, because a failure leaves main
byte-untouched.

Reference note: the reference (embulk-filter-expand_json) has no table
lifecycle; this belongs to the engine layer the north_rule adds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F


class AuditFailed(RuntimeError):
    """A WAP audit rejected the staged branch; main was not touched."""


def unique_key(key: Optional[str] = None):
    """The table's merge key must be unique (the MERGE invariant made
    auditable — a violation means engine or producer corruption)."""

    def audit(branch) -> bool:
        k = key or branch.manifest()["key"]
        dups = (
            branch.read().groupBy(k).count().filter(F.col("count") > 1)
        )
        n = dups.limit(1).count()
        if n:
            sample = [r[k] for r in dups.limit(3).collect()]
            raise AuditFailed(
                f"duplicate merge keys on branch (sample: {sample})"
            )
        return True

    return audit


def row_count_delta(
    main, max_growth_pct: float = 100.0, max_shrink_pct: float = 10.0
):
    """Staged row count must stay within bounds of MAIN's current count —
    the classic bad-feed tripwire (a producer replaying history doubles
    the table; a broken extractor empties it). Bounds are percentages;
    an empty main accepts any growth (bootstrap)."""

    def audit(branch) -> bool:
        before = main.read().count()
        after = branch.read().count()
        if before == 0:
            return True
        growth = 100.0 * (after - before) / before
        if growth > max_growth_pct:
            raise AuditFailed(
                f"row count grew {growth:.1f}% ({before} -> {after}), "
                f"bound {max_growth_pct}%"
            )
        if -growth > max_shrink_pct:
            raise AuditFailed(
                f"row count shrank {-growth:.1f}% ({before} -> {after}), "
                f"bound {max_shrink_pct}%"
            )
        return True

    return audit


def no_nulls(columns: Sequence[str]):
    """Listed columns must be fully populated on the staged state."""

    def audit(branch) -> bool:
        aggs = [
            F.sum(F.col(c).isNull().cast("long")).alias(c) for c in columns
        ]
        row = branch.read().agg(*aggs).collect()[0]
        bad = {c: row[c] for c in columns if (row[c] or 0) > 0}
        if bad:
            raise AuditFailed(f"NULLs in required columns: {bad}")
        return True

    return audit


def all_of(*audits):
    """Run every audit; the first failure wins (its reason propagates)."""

    def audit(branch) -> bool:
        for a in audits:
            a(branch)
        return True

    return audit
