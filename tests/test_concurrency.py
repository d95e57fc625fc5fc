"""Optimistic concurrency — commit validation + rebase/redo on a lost
publish race (Iceberg's commit.retry / Delta's logical conflict checking).

The realistic multi-writer deployment is ONE CDC applier racing
maintenance services (compaction, schema management, GC). Each test
stages exactly that: writer A begins a commit, and an injected hook runs
writer B's full commit (a SECOND SnapTable instance on the same path)
just before A publishes — so A always loses the race and must resolve.

Conflict matrix under test:

- merge vs compact            -> REBASE (no job re-run; state preserved)
- merge vs evolve             -> REBASE (schema adopted)
- merge vs disjoint merge     -> REBASE (bucket sets proven disjoint)
- merge vs overlapping merge  -> REDO against the fresh manifest
- merge vs rebucket           -> REDO under the new layout
- merge vs same-epoch merge   -> exactly-once SKIP + immediate cleanup
- merge vs higher-epoch merge -> SKIP (same contract as the entry check)
- compact vs merge            -> REDO (includes the merge's rows)
- evolve vs merge             -> metadata retry
- retry budget exhausted      -> CommitConflict

The reference (embulk-filter-expand_json) is a stateless per-page filter
with no commit protocol; this belongs to the engine layer the north_rule
adds (exactly-once lake upserts at 10^10-event scale, where compaction
and ingest MUST be allowed to race).
"""

import posixpath

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import (
    CommitConflict,
    SnapTable,
)


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "is_del boolean",
    )


def _row(doc_id, tok, is_del=False):
    return (doc_id, [tok], 1, "s", is_del)


def _state(t, **kw):
    return sorted(
        (r["doc_id"], list(r["tokens"]) if r["tokens"] is not None else None)
        for r in t.read(**kw).collect()
    )


def _orphan_parquets(t):
    """Unreferenced DATA files (Spark's _SUCCESS/.crc markers are never
    manifest-referenced and are remove_orphans fodder by design — the
    race-loser cleanup contract is about parquet payloads)."""
    import posixpath as pp

    ref = set()
    for v in t._versions():
        ref.update(t._referenced_paths(t.manifest(v)))
    return [
        pp.join("data", rel)
        for rel, _ in t.fs.walk_stats(t.meta_data_dir)
        if rel.endswith(".parquet")
        and not rel.rsplit("/", 1)[-1].startswith(".")
        and pp.join("data", rel) not in ref
    ]


def _ids_by_bucket(spark, num_buckets, per_bucket=4):
    """Deterministic doc_ids grouped by their merge-hash bucket, so tests
    can construct provably disjoint / overlapping commits."""
    rows = (
        spark.createDataFrame(
            [(f"k{i:03d}",) for i in range(200)], "doc_id string"
        )
        .withColumn(
            "b", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets))
        )
        .collect()
    )
    out = {}
    for r in rows:
        if len(out.setdefault(r["b"], [])) < per_bucket:
            out[r["b"]].append(r["doc_id"])
    return out


def inject_before_publish(table, action):
    """Run ``action`` (writer B's commit) once, immediately before writer
    A's next manifest publish — the canonical lost-race interleaving."""
    orig = table._publish
    fired = {"done": False}

    def wrapper(man):
        if not fired["done"]:
            fired["done"] = True
            action()
        return orig(man)

    table._publish = wrapper


@pytest.fixture()
def base(spark, tmp_path):
    """A loaded 2-bucket changelog table + id pools per bucket."""
    path = str(tmp_path / "t")
    t = SnapTable(spark, path)
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"changelog": True},
    )
    ids = _ids_by_bucket(spark, 2)
    load = [_row(d, i) for i, d in enumerate(ids[0] + ids[1])]
    t.merge(delta(spark, load), epoch=0, delete_col="is_del")
    return t, path, ids


def test_merge_rebases_over_compact(spark, base):
    t, path, ids = base
    v0 = t.manifest()["version"]
    inject_before_publish(t, lambda: SnapTable(spark, path).compact())
    r = t.merge(
        delta(spark, [_row(ids[0][0], 100)]), epoch=1, delete_col="is_del"
    )
    assert not r["skipped"]
    man = t.manifest()
    # compact committed v0+1; the merge REBASED onto it as v0+2
    assert man["version"] == v0 + 2
    assert man["summary"]["op"] == "merge"
    assert man["summary"]["rebased_from_version"] == v0
    assert t.manifest(v0 + 1)["summary"]["op"] == "compact"
    # state: the upsert applied over the compacted table
    expected = [(d, [100] if d == ids[0][0] else [i])
                for i, d in enumerate(ids[0] + ids[1])]
    assert _state(t) == sorted(expected)
    assert man["last_committed_epoch"] == 1
    # the rebased commit's change-feed entry landed at the rebased version
    ch = t.read_changes(since_version=v0 + 1)
    assert [(r["doc_id"], r["_commit_version"]) for r in ch.collect()] == [
        (ids[0][0], v0 + 2)
    ]
    # the loser self-cleaned: nothing unreferenced remains
    assert _orphan_parquets(t) == []


def test_merge_rebases_over_evolve(spark, base):
    t, path, ids = base
    v0 = t.manifest()["version"]
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).evolve_add_columns(
            [T.StructField("extra", T.LongType())]
        ),
    )
    r = t.merge(
        delta(spark, [_row(ids[1][0], 200)]), epoch=1, delete_col="is_del"
    )
    assert not r["skipped"]
    man = t.manifest()
    assert man["version"] == v0 + 2
    assert man["summary"]["rebased_from_version"] == v0
    # the rebase ADOPTED the evolved schema; old+new files null-fill
    assert "extra" in t.schema().fieldNames()
    got = {r["doc_id"]: (list(r["tokens"]), r["extra"])
           for r in t.read().collect()}
    assert got[ids[1][0]] == ([200], None)
    assert len(got) == len(ids[0]) + len(ids[1])


def test_merge_rebases_over_disjoint_merge(spark, base):
    t, path, ids = base
    v0 = t.manifest()["version"]
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[1][0], 500)]), epoch=1,
            delete_col="is_del",
        ),
    )
    # writer A touches ONLY bucket 0; the injected writer ONLY bucket 1
    r = t.merge(
        delta(spark, [_row(ids[0][0], 400)]), epoch=2, delete_col="is_del"
    )
    assert not r["skipped"]
    man = t.manifest()
    assert man["version"] == v0 + 2
    assert man["summary"]["rebased_from_version"] == v0
    assert man["last_committed_epoch"] == 2
    got = dict(_state(t))
    assert got[ids[0][0]] == [400] and got[ids[1][0]] == [500]
    assert _orphan_parquets(t) == []


def test_merge_redoes_over_overlapping_merge(spark, base):
    t, path, ids = base
    v0 = t.manifest()["version"]
    # both writers hit bucket 0 — and writer B updates the SAME key, so
    # a (wrong) rebase would lose B's write entirely; redo must not
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][0], 111), _row(ids[0][1], 222)]),
            epoch=1, delete_col="is_del",
        ),
    )
    r = t.merge(
        delta(spark, [_row(ids[0][0], 999)]), epoch=2, delete_col="is_del"
    )
    assert not r["skipped"]
    man = t.manifest()
    assert man["version"] == v0 + 2
    # a REDO is a fresh commit computed on the new manifest — not a rebase
    assert "rebased_from_version" not in man["summary"]
    got = dict(_state(t))
    assert got[ids[0][0]] == [999]  # epoch 2 wins the common key
    assert got[ids[0][1]] == [222]  # epoch 1's other row survives
    assert _orphan_parquets(t) == []


def test_merge_redoes_over_rebucket(spark, base):
    t, path, ids = base
    inject_before_publish(t, lambda: SnapTable(spark, path).rebucket(8))
    r = t.merge(
        delta(spark, [_row(ids[0][0], 321)]), epoch=1, delete_col="is_del"
    )
    assert not r["skipped"]
    man = t.manifest()
    assert man["num_buckets"] == 8  # redo committed under the NEW layout
    assert dict(_state(t))[ids[0][0]] == [321]
    # every registered file's bucket dir matches an 8-way hash layout:
    # lookup (which hashes with the manifest's count) must still prune
    assert [r["doc_id"] for r in t.lookup([ids[0][0]]).collect()] == [
        ids[0][0]
    ]


def test_merge_skips_when_same_epoch_won(spark, base):
    t, path, ids = base
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][2], 777)]), epoch=1,
            delete_col="is_del",
        ),
    )
    r = t.merge(
        delta(spark, [_row(ids[0][2], 888)]), epoch=1, delete_col="is_del"
    )
    # the twin already committed epoch 1: exactly-once skip, B's data wins
    assert r["skipped"]
    assert dict(_state(t))[ids[0][2]] == [777]
    # the skipped attempt's staged files were deleted immediately
    assert _orphan_parquets(t) == []


def test_merge_skips_behind_higher_epoch(spark, base):
    t, path, ids = base
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][0], 5)]), epoch=5, delete_col="is_del"
        ),
    )
    r = t.merge(
        delta(spark, [_row(ids[0][0], 1)]), epoch=1, delete_col="is_del"
    )
    # same contract as merge()'s entry check: epochs at-or-below the
    # committed watermark are exactly-once no-ops
    assert r["skipped"]
    assert dict(_state(t))[ids[0][0]] == [5]


def test_deferred_delta_rebase_keeps_lww_order(spark, tmp_path):
    path = str(tmp_path / "mor")
    t = SnapTable(spark, path)
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={
            "changelog": True,
            # force the MoR DEFER path at toy scale
            "min_mor_base_bytes": 0,
            "mor_rewrite_ratio": 1000.0,
            "max_delta_files_per_bucket": 100,
        },
    )
    ids = _ids_by_bucket(spark, 2)
    t.merge(
        delta(spark, [_row(d, i) for i, d in enumerate(ids[0] + ids[1])]),
        epoch=0, delete_col="is_del",
    )
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[1][0], 50)]), epoch=1,
            delete_col="is_del",
        ),
    )
    r = t.merge(
        delta(spark, [_row(ids[0][0], 60)]), epoch=2, delete_col="is_del"
    )
    assert not r["skipped"] and r["buckets_deferred"] == 1
    man = t.manifest()
    # the rebased deferred entry's LWW sequence == the version it actually
    # committed at (commit order == seq order == epoch order)
    seqs = [f["seq"] for f in man["files"]
            if f.get("kind") == "delta" and f.get("seq") == man["version"]]
    assert seqs, "rebased deferred delta entry must carry the new seq"
    got = dict(_state(t))
    assert got[ids[0][0]] == [60] and got[ids[1][0]] == [50]


def test_compact_redoes_over_merge(spark, base):
    t, path, ids = base
    new_id = "zz_fresh"
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(new_id, 42), (ids[0][0], None, None, None, True)]),
            epoch=1, delete_col="is_del",
        ),
    )
    r = t.compact()
    assert r["compacted"]
    # the redone compaction reflects the racing merge: upsert present,
    # deleted key gone, delta stack folded
    got = dict(_state(t))
    assert got[new_id] == [42] and ids[0][0] not in got
    assert t.manifest()["summary"]["op"] == "compact"
    assert _orphan_parquets(t) == []


def test_evolve_retries_over_merge_race(spark, base):
    t, path, ids = base
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][0], 9)]), epoch=1, delete_col="is_del"
        ),
    )
    assert t.evolve_add_columns([T.StructField("lang", T.StringType())])
    assert "lang" in t.schema().fieldNames()
    assert dict(_state(t))[ids[0][0]] == [9]  # both commits landed


def test_retry_budget_exhaustion_raises(spark, base):
    t, path, ids = base
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][1], 7)]), epoch=1, delete_col="is_del"
        ),
    )
    with pytest.raises(CommitConflict):
        # overlapping-bucket conflict needs a redo, but the budget is 0
        t.merge(
            delta(spark, [_row(ids[0][0], 8)]), epoch=2,
            delete_col="is_del", max_commit_retries=0,
        )
    # the failed attempt still cleaned up after itself
    assert _orphan_parquets(t) == []
