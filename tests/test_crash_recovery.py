"""Crash-recovery semantics: a failure between data write and manifest
publish must leave the table untouched (orphans only) and a retry must
succeed exactly-once."""

import os

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def test_abort_between_write_and_publish_then_retry(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    t.merge(delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del")
    v_before = t.manifest()["version"]
    state_before = sorted(r["doc_id"] for r in t.read().collect())

    # simulated crash: pre_commit=False aborts AFTER the data files landed
    r = t.merge(
        delta(spark, [("b", [2], 1, "s", False)]),
        epoch=1,
        delete_col="is_del",
        pre_commit=lambda: False,
    )
    assert r["aborted"]
    # nothing published: version and readable state unchanged
    assert t.manifest()["version"] == v_before
    assert sorted(x["doc_id"] for x in t.read().collect()) == state_before
    # the orphaned files exist on disk but are unreferenced
    orphan_dir = os.path.join(str(tmp_path / "t"), r["orphaned_dir"])
    assert os.path.isdir(orphan_dir)
    referenced = {f["path"] for f in t.manifest()["files"]}
    assert not any(r["orphaned_dir"] in p for p in referenced)

    # retry commits exactly-once
    r2 = t.merge(
        delta(spark, [("b", [2], 1, "s", False)]), epoch=1, delete_col="is_del"
    )
    assert not r2.get("aborted") and not r2.get("skipped")
    assert sorted(x["doc_id"] for x in t.read().collect()) == ["a", "b"]
    # replaying the same epoch after success is a no-op
    r3 = t.merge(
        delta(spark, [("b", [999], 1, "s", False)]), epoch=1, delete_col="is_del"
    )
    assert r3["skipped"]
    assert t.read().filter("doc_id = 'b'").first()["tokens"] == [2]
