"""Write-audit-publish branches (Iceberg branch + fast_forward parity):
isolated commit chains over the shared data tree, verbatim-manifest
publication onto main, divergence detection, and GC that treats branch
references as live."""

import pytest

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import (
    CommitConflict,
    SnapTable,
)

from tests.test_gc_and_mor import data_files_on_disk, delta, make_table


def rows_of(t, **kw):
    return sorted((r["doc_id"], r["tokens"]) for r in t.read(**kw).collect())


def seeded(spark, tmp_path, buckets=2):
    t = make_table(spark, tmp_path / "t", buckets=buckets,
                   properties={"changelog": True})
    for e in range(2):
        t.merge(
            delta(spark, [(f"k{i}", [e], 1, "s", False) for i in range(8)]),
            epoch=e,
            delete_col="is_del",
        )
    return t


def test_wap_stage_audit_publish(spark, tmp_path):
    t = seeded(spark, tmp_path)
    main_before = rows_of(t)
    head_before = t.manifest()["version"]

    b = t.create_branch("audit")
    assert t.branches() == ["audit"]
    # stage epoch 2 on the branch: an upsert and a delete
    b.merge(
        delta(spark, [("k0", [2], 1, "s", False), ("k1", None, 0, "s", True)]),
        epoch=2,
        delete_col="is_del",
    )
    # isolation: main sees nothing; the branch sees the staged state
    assert rows_of(t) == main_before
    assert t.manifest()["version"] == head_before
    staged = rows_of(b)
    assert ("k0", [2]) in staged and all(d != "k1" for d, _ in staged)
    assert b.manifest()["last_committed_epoch"] == 2

    # audit passed -> publish
    r = t.fast_forward("audit")
    assert r["published_versions"] == [head_before + 1]
    assert rows_of(t) == staged
    assert t.manifest()["last_committed_epoch"] == 2
    # the feed is continuous across the publish (manifests land verbatim)
    changes = t.read_changes(head_before)
    assert changes.filter("_change_type = 'delete'").count() == 1

    # exactly-once: re-applying the published epoch on main is a no-op
    assert t.merge(
        delta(spark, [("k0", [2], 1, "s", False)]),
        epoch=2,
        delete_col="is_del",
    )["skipped"]

    # the branch can keep going; a second fast-forward publishes the rest
    b.merge(delta(spark, [("k2", [3], 1, "s", False)]), epoch=3,
            delete_col="is_del")
    r2 = t.fast_forward("audit")
    assert r2["published_versions"] == [head_before + 2]
    assert rows_of(t) == rows_of(b)

    t.drop_branch("audit")
    assert t.branches() == []
    with pytest.raises(FileNotFoundError):
        t.branch("audit")


def test_fast_forward_rejects_divergence(spark, tmp_path):
    t = seeded(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge(delta(spark, [("k0", [9], 1, "s", False)]), epoch=2,
            delete_col="is_del")
    # main advances independently -> heads diverged
    t.merge(delta(spark, [("k7", [8], 1, "s", False)]), epoch=2,
            delete_col="is_del")
    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    # main is untouched by the failed publish; the branch stays readable
    assert ("k7", [8]) in rows_of(t)
    assert ("k0", [9]) in rows_of(b)


def test_gc_never_reclaims_branch_referenced_files(spark, tmp_path):
    t = seeded(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge(
        delta(spark, [(f"n{i}", [5], 1, "s", False) for i in range(8)]),
        epoch=2,
        delete_col="is_del",
    )
    staged = rows_of(b)

    # main GC with the harshest knobs: branch files must survive
    t.expire_snapshots(keep_last=1)
    t.remove_orphans(older_than_sec=0.0)
    assert rows_of(b) == staged  # branch still fully readable

    # dropping the branch releases its files to the orphan sweep
    n_before = len(data_files_on_disk(t))
    t.drop_branch("audit")
    swept = t.remove_orphans(older_than_sec=0.0)
    assert swept["files_removed"] > 0
    assert len(data_files_on_disk(t)) < n_before
    # main state never flinched
    assert t.read().count() == 8


def test_branch_handles_guard_main_only_ops(spark, tmp_path):
    t = seeded(spark, tmp_path)
    b = t.create_branch("audit")
    for op in (
        lambda: b.expire_snapshots(keep_last=1),
        lambda: b.remove_orphans(older_than_sec=0.0),
        lambda: b.restore(version=1),
        lambda: b.create_tag("x"),
        lambda: b.create_branch("nested"),
        lambda: b.branch("audit"),
        lambda: b.drop_branch("audit"),
        lambda: b.fast_forward("audit"),
    ):
        with pytest.raises(RuntimeError):
            op()
    with pytest.raises(CommitConflict):
        t.create_branch("audit")  # create-exclusive
    with pytest.raises(ValueError):
        t.create_branch("bad name!")


def test_branch_compaction_publishes(spark, tmp_path):
    """A compaction audited on a branch: rewritten files land shared, main
    adopts them on fast-forward — the maintenance-as-WAP flow."""
    t = seeded(spark, tmp_path)
    before = rows_of(t)
    b = t.create_branch("maint")
    c = b.compact()
    assert c["compacted"]
    assert rows_of(b) == before
    t.fast_forward("maint")
    assert rows_of(t) == before
    assert t.manifest()["summary"]["op"] == "compact"
    t.drop_branch("maint")
    t.remove_orphans(older_than_sec=0.0)
    assert rows_of(t) == before


def test_fast_forward_midway_race_leaves_consistent_prefix(spark, tmp_path):
    """A rival main commit landing BETWEEN two fast-forward publishes:
    the second PUT loses the create-exclusive race, CommitConflict is
    raised, and main is left on a consistent prefix (the first branch
    commit) — every fast-forwarded manifest was a valid table state."""
    t = seeded(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge(delta(spark, [("k0", [7], 1, "s", False)]), epoch=2,
            delete_col="is_del")
    b.merge(delta(spark, [("k1", [8], 1, "s", False)]), epoch=3,
            delete_col="is_del")
    bversions = b._versions()
    # rival steals the SECOND slot between our two publishes: wrap the fs
    # so the rival manifest appears right after the first PUT lands
    import json as _json
    import os as _os

    real_publish = t.fs.publish_atomic
    calls = []

    def racing_publish(content, final_path):
        real_publish(content, final_path)
        calls.append(final_path)
        if len(calls) == 1:
            rival = _json.loads(
                open(
                    _os.path.join(t.log_dir, f"v{bversions[-3]:08d}.json")
                ).read()
            )
            rival["version"] = bversions[-1]
            rival["commit_uuid"] = "rival"
            open(
                _os.path.join(t.log_dir, f"v{bversions[-1]:08d}.json"), "w"
            ).write(_json.dumps(rival))

    t.fs.publish_atomic = racing_publish
    try:
        with pytest.raises(CommitConflict, match="consistent"):
            t.fast_forward("audit")
    finally:
        t.fs.publish_atomic = real_publish
    # the prefix (first branch commit) IS published and readable
    assert t.manifest(bversions[-2])["commit_uuid"] == b.manifest(
        bversions[-2]
    )["commit_uuid"]
    state = {r["doc_id"]: r["tokens"]
             for r in t.read(version=bversions[-2]).collect()}
    assert state["k0"] == [7]


def test_create_branch_cleans_marker_when_seed_publish_fails(spark, tmp_path):
    t = seeded(spark, tmp_path)
    real = t.fs.publish_atomic
    calls = []

    def failing(content, final_path):
        calls.append(final_path)
        if len(calls) == 2:  # the seed manifest
            raise OSError("disk full")
        real(content, final_path)

    t.fs.publish_atomic = failing
    try:
        with pytest.raises(OSError, match="disk full"):
            t.create_branch("audit")
    finally:
        t.fs.publish_atomic = real
    assert t.branches() == []          # invisible
    b = t.create_branch("audit")       # name immediately reusable
    assert b.read().count() == 8


def test_fast_forward_many_commits_is_metadata_only(spark, tmp_path):
    """30 staged commits publish as 30 small file ops — no Spark job, no
    data movement; wall time stays far below one job launch per commit."""
    import time as _time

    t = seeded(spark, tmp_path)
    b = t.create_branch("audit")
    for i in range(30):
        b.merge(delta(spark, [(f"k{i % 8}", [100 + i], 1, "s", False)]),
                epoch=2 + i, delete_col="is_del")
    t0 = _time.time()
    r = t.fast_forward("audit")
    dt = _time.time() - t0
    assert len(r["published_versions"]) == 30
    assert dt < 5.0, f"fast-forward of 30 commits took {dt:.2f}s"
    assert rows_of(t) == rows_of(b)
    assert t.manifest()["last_committed_epoch"] == 31
