"""SnapTable time-travel and compaction."""

import pytest

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def test_time_travel(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    t.merge(delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del")
    v_after_e0 = t.manifest()["version"]
    t.merge(delta(spark, [("a", [2], 1, "s", False)]), epoch=1, delete_col="is_del")
    assert t.read().first()["tokens"] == [2]
    assert t.read(version=v_after_e0).first()["tokens"] == [1]
    assert t.read(version=1).count() == 0  # the empty created table


def test_compaction_preserves_state(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "c"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    for e in range(4):
        t.merge(
            delta(spark, [(f"k{e}{i}", [e, i], 2, "s", False) for i in range(8)]),
            epoch=e,
            delete_col="is_del",
        )
    before = sorted(r["doc_id"] for r in t.read().collect())
    n_files_before = len(t.manifest()["files"])
    r = t.compact()
    assert r["compacted"]
    assert r["files_after"] <= r["files_before"]
    after = sorted(r["doc_id"] for r in t.read().collect())
    assert before == after
    # epoch watermark untouched: replaying epoch 3 is still a no-op
    res = t.merge(
        delta(spark, [("k00", [9], 1, "s", False)]), epoch=3, delete_col="is_del"
    )
    assert res["skipped"]
    # time-travel to pre-compaction still sees the same rows
    assert sorted(
        r["doc_id"] for r in t.read(version=t.manifest()["version"] - 1).collect()
    ) == before
    assert n_files_before >= r["files_after"]


def test_publish_conflict_is_atomic(spark, tmp_path):
    """A racing writer publishing the same manifest version must fail with
    CommitConflict (os.link EEXIST) — never silently clobber the committed
    manifest."""
    import json
    import os

    from pyspark.sql import types as T

    from embulk_filter_expand_json_spark.streaming.snaptable import (
        CommitConflict,
        SnapTable,
    )

    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(
        T.StructType([T.StructField("doc_id", T.StringType())]), key="doc_id"
    )
    man = t.manifest()
    man2 = dict(man, properties={"racer": True})
    with pytest.raises(CommitConflict):
        t._publish(man2)  # same version already committed
    # the original manifest is untouched and no tmp files leak
    assert t.manifest() == man
    leftovers = [f for f in os.listdir(t.log_dir) if f.startswith(".tmp")]
    assert leftovers == []


def _mk_table(spark, path, properties=None):
    t = SnapTable(spark, path)
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=4, properties=properties
    )
    return t


def test_mor_defer_and_read_merge(spark, tmp_path):
    """A small delta against a big base is DEFERRED (delta entries in the
    manifest, no base rewrite); readers merge base+delta with LWW and
    delete suppression; time travel sees the pre-delta state."""
    # floor off: these fixtures are KB-sized, far below the production
    # min_mor_base_bytes under which deferral never wins
    t = _mk_table(spark, str(tmp_path / "t"),
                  properties={"min_mor_base_bytes": 0})
    big = [
        (f"doc-{i:04d}", [(i * 7919 + j * 104729) % 50000 for j in range(50)],
         50, "s", False)
        for i in range(4000)
    ]
    r0 = t.merge(delta(spark, big), epoch=0, delete_col="is_del")
    assert r0["buckets_deferred"] == 0  # first load: staged files ARE base
    v_base = r0["version"]

    small = [
        ("doc-0001", [999], 1, "s", False),   # update
        ("doc-0002", None, None, None, True), # delete
        ("doc-9999", [7], 1, "s", False),     # insert
    ]
    r1 = t.merge(delta(spark, small), epoch=1, delete_col="is_del")
    assert r1["buckets_deferred"] > 0
    assert r1["files_rewritten"] == 0
    man = t.manifest()
    assert any(f.get("kind") == "delta" for f in man["files"])

    state = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert state["doc-0001"] == [999]
    assert "doc-0002" not in state
    assert state["doc-9999"] == [7]
    assert len(state) == 4000  # 4000 - 1 delete + 1 insert
    # time travel: pre-delta snapshot still pure base
    old = {r["doc_id"]: r["tokens"] for r in t.read(v_base).collect()}
    assert old["doc-0001"] == big[1][1] and "doc-0002" in old

    # a second deferred delta stacks; newest seq wins
    r2 = t.merge(
        delta(spark, [("doc-0001", [1000], 1, "s", False)]),
        epoch=2,
        delete_col="is_del",
    )
    assert r2["buckets_deferred"] > 0
    assert t.read().filter("doc_id = 'doc-0001'").first()["tokens"] == [1000]


def test_mor_forced_compaction_bounds_delta_stack(spark, tmp_path):
    """Once a bucket's delta stack exceeds max_delta_files_per_bucket the
    commit compacts it back into base files — read amplification is bounded
    with no separate maintenance job."""
    t = _mk_table(
        spark,
        str(tmp_path / "t"),
        properties={"max_delta_files_per_bucket": 2, "mor_rewrite_ratio": 0.0001,
                    "min_mor_base_bytes": 0},
    )
    # ratio tiny -> every non-fresh epoch would defer; the FILE cap forces
    # periodic per-bucket compaction instead
    t.merge(
        delta(spark, [(f"doc-{i:04d}", [i], 1, "s", False) for i in range(100)]),
        epoch=0,
        delete_col="is_del",
    )
    for e in range(1, 6):
        t.merge(
            delta(spark, [(f"doc-{i:04d}", [e], 1, "s", False) for i in range(0, 100, 7)]),
            epoch=e,
            delete_col="is_del",
        )
    man = t.manifest()
    per_bucket: dict = {}
    for f in man["files"]:
        if f.get("kind") == "delta":
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(n <= 2 for n in per_bucket.values()), per_bucket
    state = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert state["doc-0000"] == [5] and state["doc-0001"] == [1]


def test_compact_folds_outstanding_deltas(spark, tmp_path):
    # high ratio -> the small epoch-1 delta is always deferred
    t = _mk_table(spark, str(tmp_path / "t"),
                  properties={"mor_rewrite_ratio": 0.99,
                              "min_mor_base_bytes": 0})
    t.merge(
        delta(spark, [(f"doc-{i:04d}", [i], 1, "s", False) for i in range(300)]),
        epoch=0,
        delete_col="is_del",
    )
    t.merge(
        delta(spark, [("doc-0000", [42], 1, "s", False),
                      ("doc-0001", None, None, None, True)]),
        epoch=1,
        delete_col="is_del",
    )
    assert any(f.get("kind") == "delta" for f in t.manifest()["files"])
    res = t.compact()
    assert res["compacted"]
    man = t.manifest()
    assert not any(f.get("kind") == "delta" for f in man["files"])
    state = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert state["doc-0000"] == [42] and "doc-0001" not in state
    assert len(state) == 299


def test_signature_store_drives_incremental_dedup(spark, tmp_path):
    """Layer integration: the MinHash signature table that
    minhash_dedup_against probes is maintained TRANSACTIONALLY in a
    SnapTable — exactly-once appends per accepted batch, time travel
    giving dedup-as-of-any-version. This is the deployment shape the
    operator docstring promises (signatures 'maintained in a SnapTable
    ... appended per accepted batch'); here the whole loop runs."""
    from pyspark.sql import functions as F, types as T

    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_dedup_against,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "pack my box with five dozen liquor jugs tonight again"),
        ],
        "doc_id long, text string",
    )
    sig_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("minhash", T.ArrayType(T.LongType())),
        ]
    )
    store = SnapTable(spark, str(tmp_path / "sigs"))
    store.create(sig_schema, key="doc_id", num_buckets=2)
    store.merge(minhash_signatures(corpus), epoch=0)
    v0 = store.manifest()["version"]

    # batch 1: one near-dup of corpus doc 1, one fresh doc
    batch1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog every day!"),
            (11, "completely novel content about container orchestration"),
        ],
        "doc_id long, text string",
    )
    hits = minhash_dedup_against(
        batch1, corpus_sigs=store.read(), verify="estimate", threshold=0.8
    )
    dup_ids = {r["id_new"] for r in hits.collect()}
    assert dup_ids == {10}

    # accept the survivors: append their signatures exactly-once
    survivors = batch1.filter(~F.col("doc_id").isin(list(dup_ids)))
    store.merge(minhash_signatures(survivors), epoch=1)
    lineage = store.merge(minhash_signatures(survivors), epoch=1)  # replay
    assert lineage.get("skipped"), "epoch replay must be a recorded no-op"
    assert store.read().count() == 3

    # batch 2 collides with the batch-1 ACCEPTED doc -> only visible
    # through the updated store...
    batch2 = spark.createDataFrame(
        [(20, "completely novel content about container orchestration!")],
        "doc_id long, text string",
    )
    hits2 = minhash_dedup_against(
        batch2, corpus_sigs=store.read(), verify="estimate", threshold=0.8
    )
    assert {(r["id_new"], r["id_corpus"]) for r in hits2.collect()} == {(20, 11)}

    # ...and dedup-as-of-v0 (time travel) must NOT see it
    hits2_v0 = minhash_dedup_against(
        batch2, corpus_sigs=store.read(version=v0), verify="estimate",
        threshold=0.8,
    )
    assert hits2_v0.count() == 0
