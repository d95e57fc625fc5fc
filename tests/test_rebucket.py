"""SnapTable.rebucket — bucket-layout evolution (the Iceberg
partition-spec-evolution analog for the hash-bucket MERGE layout).

The 100 TB contract: bucket count is sized to DATA (0.25-1 GB/bucket), so
a growing table must be able to widen its layout without losing the epoch
watermark, the change feed, or time travel. These tests drive the full
lifecycle across a rebucket: state parity, continued merges under the new
layout, pruned lookups hashing with the manifest-of-the-version's count,
feed continuity, and old-layout reclamation by expire_snapshots.
"""

import posixpath

import pytest

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def _state(t, **kw):
    return sorted(
        (r["doc_id"], list(r["tokens"])) for r in t.read(**kw).collect()
    )


@pytest.fixture()
def loaded(spark, tmp_path):
    """A 2-bucket table with upserts, a delete, and (via a tiny trickle
    epoch against a large mor floor default being absent at this scale) a
    fully-exercised merge history."""
    t = SnapTable(
        spark, str(tmp_path / "t"),
    )
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
             properties={"changelog": True})
    t.merge(
        delta(spark, [(f"d{i:02d}", [i], 1, "s", False) for i in range(20)]),
        epoch=0,
        delete_col="is_del",
    )
    t.merge(
        delta(spark, [("d00", [100], 1, "s", False), ("d01", None, None, None, True)]),
        epoch=1,
        delete_col="is_del",
    )
    return t


def test_rebucket_preserves_state_and_watermark(spark, loaded):
    t = loaded
    before = _state(t)
    v_pre = t.manifest()["version"]
    r = t.rebucket(8)
    assert r["rebucketed"] and r["buckets_before"] == 2
    man = t.manifest()
    assert man["num_buckets"] == 8
    assert _state(t) == before
    # every file entry re-homed into the new layout
    assert {f["bucket"] for f in man["files"]} <= set(range(8))
    assert all(f.get("kind", "base") == "base" for f in man["files"])
    # epoch watermark survives: replaying epoch 1 is still a no-op
    res = t.merge(
        delta(spark, [("d00", [9], 1, "s", False)]), epoch=1, delete_col="is_del"
    )
    assert res["skipped"]
    # time travel to the pre-rebucket version sees the old state verbatim
    assert _state(t, version=v_pre) == before


def test_merge_and_lookup_continue_under_new_layout(spark, loaded):
    t = loaded
    v_pre = t.manifest()["version"]
    t.rebucket(8)
    t.merge(
        delta(spark, [("d05", [555], 1, "s", False), ("zz", [7], 1, "s", False)]),
        epoch=2,
        delete_col="is_del",
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
    assert got["d05"] == [555] and got["zz"] == [7] and "d01" not in got
    # new files land in the 8-bucket space
    assert {f["bucket"] for f in t.manifest()["files"]} <= set(range(8))
    # point read hashes with the CURRENT manifest's count...
    assert t.lookup(["d05"]).first()["tokens"] == [555]
    # ...and a time-travel lookup hashes with THAT version's count (2)
    assert t.lookup(["d05"], version=v_pre).first()["tokens"] == [5]


def test_change_feed_spans_a_rebucket(spark, loaded):
    t = loaded
    t.rebucket(4)
    t.merge(
        delta(spark, [("d02", [222], 1, "s", False)]), epoch=2, delete_col="is_del"
    )
    feed = t.read_changes(0)
    # all three merge commits visible; the rebucket itself is NOT a change
    assert feed.filter("_change_type = 'delete'").count() == 1
    assert feed.filter("doc_id = 'd02' and _commit_epoch = 2").count() == 1
    assert feed.count() == 23  # 20 + 2 + 1 rows across epochs 0..2
    epochs = {r["_commit_epoch"] for r in feed.select("_commit_epoch").collect()}
    assert epochs == {0, 1, 2}


def test_rebucket_folds_outstanding_deltas(spark, tmp_path):
    """A table holding MoR delta files rebuckets into pure base files."""
    t = SnapTable(spark, str(tmp_path / "m"))
    t.create(
        SEQUENCES_SCHEMA,
        key="doc_id",
        num_buckets=2,
        properties={"min_mor_base_bytes": 0, "mor_rewrite_ratio": 1e9},
    )
    t.merge(
        delta(spark, [(f"d{i}", [i], 1, "s", False) for i in range(10)]), epoch=0
    )
    t.merge(delta(spark, [("d0", [42], 1, "s", False)]), epoch=1)
    assert any(f.get("kind") == "delta" for f in t.manifest()["files"])
    before = _state(t)
    t.rebucket(5)
    man = t.manifest()
    assert not any(f.get("kind") == "delta" for f in man["files"])
    assert _state(t) == before and before[0] == ("d0", [42])


def test_rebucket_downsize_and_noop(spark, loaded):
    t = loaded
    before = _state(t)
    t.rebucket(1)
    assert t.manifest()["num_buckets"] == 1 and _state(t) == before
    r = t.rebucket(1)
    assert not r["rebucketed"]
    with pytest.raises(ValueError):
        t.rebucket(0)


def test_rebucket_empty_table_is_manifest_only(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "e"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    r = t.rebucket(64)
    assert r["rebucketed"] and r["files_after"] == 0
    t.merge(delta(spark, [("a", [1], 1, "s", False)]), epoch=0)
    assert t.manifest()["num_buckets"] == 64
    assert t.lookup(["a"]).count() == 1


def test_pipeline_auto_rebucket_grows_layout(spark, tmp_path):
    """CdcPipeline(auto_rebucket_bytes=...) doubles the bucket count when
    mean base bytes/bucket pass the target — and the replay's final state,
    epoch watermark, and change feed stay identical to a fixed-layout
    run."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    cfg = ChangeGenConfig(n_events=2_000, n_docs=200, batch_size=500, seed=3)
    log = str(tmp_path / "log")
    write_changes(spark, cfg, log)

    auto = CdcPipeline(
        spark,
        log,
        str(tmp_path / "auto"),
        num_buckets=2,
        changelog=True,
        auto_rebucket_bytes=4096,  # tiny target: forces growth mid-replay
    )
    metrics = auto.run()
    grown = [m.rebucketed_to for m in metrics if m.rebucketed_to]
    assert grown, "the tiny byte target must trigger at least one doubling"
    assert auto.table.manifest()["num_buckets"] == 2 * 2 ** len(grown)

    fixed = CdcPipeline(spark, log, str(tmp_path / "fixed"), num_buckets=2)
    fixed.run()
    assert sorted(map(tuple, auto.table.read().collect())) == sorted(
        map(tuple, fixed.table.read().collect())
    )
    # watermark + feed survive the mid-replay layout changes
    assert auto.last_committed_epoch() == fixed.last_committed_epoch()
    assert auto.table.read_changes(0).count() > 0
    # resume is still exactly-once
    again = CdcPipeline(
        spark, log, str(tmp_path / "auto"), num_buckets=2,
        changelog=True, auto_rebucket_bytes=4096,
    )
    assert all(m.skipped for m in again.run())


def test_expire_reclaims_old_layout(spark, loaded):
    t = loaded
    old_paths = {f["path"] for f in t.manifest()["files"]}
    t.rebucket(8)
    r = t.expire_snapshots(keep_last=1)
    assert r["files_removed"] > 0
    # every old-layout file not kept alive by the retained manifest (the
    # change feed still references epoch staging files) is gone from disk
    still_referenced = t._referenced_paths(t.manifest())
    dead = old_paths - still_referenced
    assert dead, "rebucket must orphan at least one old-layout base file"
    for p in dead:
        assert not t.fs.isfile(t._mpath(p))
    # old versions are unreadable (expired), the new one intact
    assert len(_state(t)) == 19
