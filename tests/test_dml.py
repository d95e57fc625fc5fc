"""Row-level DML (delete_where / update_where) and snapshot restore.

Delta parity surface: ``DELETE FROM t WHERE``, ``UPDATE t SET ... WHERE``,
``RESTORE TABLE t TO VERSION AS OF v``. The engine-level contracts under
test beyond plain row edits:

- DML routes through the staged-delta MERGE machinery: change feed rows
  (pre-image deletes / after-image upserts), bucket-local rewrites, MoR
  deferral, optimistic concurrency — all inherited, none re-implemented.
- DML does NOT advance ``last_committed_epoch``: interactive maintenance
  between two CDC epochs must never make the pipeline skip a source batch.
- Snapshot isolation under races: a bucket-disjoint rival rebases with no
  job re-run; an overlapping rival forces the predicate to RECOMPUTE
  against fresh state (never a restage of stale matches).
- restore() is metadata-only, rolls back the watermark (so the pipeline
  re-applies undone epochs exactly-once) and truncates the change feed
  (consumers already saw the undone commits — loud re-snapshot contract).

The reference (embulk-filter-expand_json) is a stateless per-page filter;
this belongs to the engine layer the north_rule adds.
"""

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import (
    CommitConflict,
    SnapTable,
)

from tests.test_concurrency import (
    _ids_by_bucket,
    _orphan_parquets,
    delta,
    inject_before_publish,
)


def _row(doc_id, tok, n_tok=1, source="s", is_del=False):
    return (doc_id, [tok], n_tok, source, is_del)


@pytest.fixture()
def table(spark, tmp_path):
    """2-bucket changelog table loaded with 8 rows (epochs 0 and 1)."""
    path = str(tmp_path / "t")
    t = SnapTable(spark, path)
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"changelog": True},
    )
    ids = _ids_by_bucket(spark, 2)
    t.merge(
        delta(spark, [_row(d, i, n_tok=i) for i, d in enumerate(ids[0])]),
        epoch=0, delete_col="is_del",
    )
    t.merge(
        delta(
            spark,
            [_row(d, 10 + i, n_tok=10 + i, source="web")
             for i, d in enumerate(ids[1])],
        ),
        epoch=1, delete_col="is_del",
    )
    return t, path, ids


def _docs(t, **kw):
    return sorted(r["doc_id"] for r in t.read(**kw).collect())


# ------------------------------------------------------------ delete_where
def test_delete_where_removes_matches_only(spark, table):
    t, _, ids = table
    before = _docs(t)
    r = t.delete_where(F.col("source") == "web")
    assert not r["skipped"]
    assert _docs(t) == sorted(set(before) - set(ids[1]))


def test_delete_where_sql_string_and_null_predicate(spark, table):
    t, _, ids = table
    # NULL-valued predicate keeps the row (SQL DELETE semantics)
    v0 = t.manifest()["version"]
    t.delete_where("cast(null as boolean)")
    assert len(_docs(t)) == len(ids[0]) + len(ids[1])
    # SQL-string condition works for real matches
    t.delete_where(f"doc_id = '{ids[0][0]}'")
    assert ids[0][0] not in _docs(t)
    assert t.manifest()["version"] == v0 + 2


def test_delete_where_preserves_watermark_and_pipeline_resume(spark, table):
    t, _, ids = table
    assert t.manifest()["last_committed_epoch"] == 1
    t.delete_where(F.col("source") == "web")
    # watermark untouched: the next source epoch must still apply
    assert t.manifest()["last_committed_epoch"] == 1
    r = t.merge(
        delta(spark, [_row("new-doc", 99)]), epoch=2, delete_col="is_del"
    )
    assert not r["skipped"]
    assert t.manifest()["last_committed_epoch"] == 2
    # and exactly-once still skips an already-applied epoch
    assert t.merge(
        delta(spark, [_row("dup", 1)]), epoch=2, delete_col="is_del"
    )["skipped"]


def test_delete_where_feed_carries_pre_image(spark, table):
    t, _, ids = table
    v0 = t.manifest()["version"]
    t.delete_where(F.col("source") == "web")
    changes = t.read_changes(v0).collect()
    assert sorted(r["doc_id"] for r in changes) == sorted(ids[1])
    assert {r["_change_type"] for r in changes} == {"delete"}
    # pre-image: the deleted rows' payloads ride the feed (not nulls)
    assert all(r["source"] == "web" and r["n_tok"] is not None
               for r in changes)
    assert {r["_commit_version"] for r in changes} == {v0 + 1}


def test_delete_where_no_matches_is_safe(spark, table):
    t, _, _ = table
    before = _docs(t)
    r = t.delete_where(F.col("doc_id") == "nope")
    assert not r["skipped"]
    assert _docs(t) == before


def test_delete_where_history_op(spark, table):
    t, _, _ = table
    t.delete_where("source = 'web'")
    assert t.manifest()["summary"]["op"] == "delete-where"
    assert any(h["summary"]["op"] == "delete-where" for h in t.history())


# ------------------------------------------------------------ update_where
def test_update_where_assigns_and_preserves_others(spark, table):
    t, _, ids = table
    r = t.update_where(
        F.col("source") == "web", {"source": F.lit("quarantined")}
    )
    assert not r["skipped"]
    rows = {r["doc_id"]: r for r in t.read().collect()}
    for d in ids[1]:
        assert rows[d]["source"] == "quarantined"
        assert rows[d]["tokens"] is not None  # untouched columns survive
    for d in ids[0]:
        assert rows[d]["source"] == "s"


def test_update_where_set_sees_pre_update_row(spark, table):
    t, _, ids = table
    # all SET expressions evaluate against the PRE-update row (SQL UPDATE):
    # source captures the old n_tok even though n_tok is reassigned first
    # in the dict
    t.update_where(
        "source = 'web'",
        {"n_tok": "n_tok + 1000", "source": "concat('was-', n_tok)"},
    )
    rows = {r["doc_id"]: r for r in t.read().collect()}
    for i, d in enumerate(ids[1]):
        assert rows[d]["n_tok"] == 10 + i + 1000
        assert rows[d]["source"] == f"was-{10 + i}"


def test_update_where_rejects_key_and_unknown_columns(spark, table):
    t, _, _ = table
    with pytest.raises(ValueError, match="merge key"):
        t.update_where("true", {"doc_id": "concat(doc_id, '!')"})
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where("true", {"nope": "1"})


def test_update_where_feed_carries_after_image(spark, table):
    t, _, ids = table
    v0 = t.manifest()["version"]
    t.update_where("source = 'web'", {"n_tok": "n_tok * 2"})
    changes = t.read_changes(v0).collect()
    assert {r["_change_type"] for r in changes} == {"upsert"}
    assert sorted(r["doc_id"] for r in changes) == sorted(ids[1])
    assert all(r["n_tok"] == 2 * (10 + i)
               for i, r in enumerate(sorted(changes,
                                            key=lambda r: r["n_tok"])))
    assert t.manifest()["last_committed_epoch"] == 1  # watermark pinned


def test_update_where_watermark_not_advanced_mid_pipeline(spark, table):
    t, _, _ = table
    t.update_where("true", {"n_tok": "n_tok"})
    assert t.manifest()["last_committed_epoch"] == 1


# --------------------------------------------------------- DML concurrency
def test_delete_where_rebases_over_disjoint_merge(spark, table):
    t, path, ids = table
    v0 = t.manifest()["version"]
    # rival commits into bucket 0; our delete targets bucket-1 rows only
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row(ids[0][0], 777)]), epoch=2,
            delete_col="is_del",
        ),
    )
    t.delete_where(F.col("source") == "web")
    man = t.manifest()
    assert man["version"] == v0 + 2  # rival v0+1, DML rebased as v0+2
    assert man["summary"]["op"] == "delete-where"
    assert man["summary"]["rebased_from_version"] == v0
    # both effects present; rival's advanced watermark NOT regressed
    assert man["last_committed_epoch"] == 2
    docs = _docs(t)
    assert ids[0][0] in docs and not any(d in docs for d in ids[1])
    assert _orphan_parquets(t) == []


def test_delete_where_recomputes_on_overlapping_race(spark, table):
    """Serializability proof: the rival UPDATEs a row so it no longer
    matches the delete predicate; the delete must recompute against fresh
    state and spare it (a stale restage would delete it)."""
    t, path, ids = table
    saved = ids[1][0]

    def rival():
        SnapTable(spark, path).merge(
            delta(spark, [_row(saved, 555, n_tok=555, source="kept")]),
            epoch=2, delete_col="is_del",
        )

    inject_before_publish(t, rival)
    t.delete_where(F.col("source") == "web")
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert saved in rows and rows[saved]["source"] == "kept"
    assert not any(d in rows for d in ids[1][1:])
    assert _orphan_parquets(t) == []


def test_dml_conflict_budget_exhaustion(spark, table):
    t, path, ids = table

    def always_rival():
        SnapTable(spark, path).merge(
            delta(spark, [_row(ids[1][0], 1)]),
            epoch=t.manifest()["last_committed_epoch"] + 1,
            delete_col="is_del",
        )

    # re-arm the rival before EVERY publish attempt so each recompute loses
    orig = t._publish

    def wrapper(man):
        always_rival()
        return orig(man)

    t._publish = wrapper
    with pytest.raises(CommitConflict, match="recompute retries"):
        t.delete_where(F.col("source") == "web", max_commit_retries=2)


# ----------------------------------------------------------------- restore
def test_restore_rolls_back_state_watermark_and_replays(spark, table):
    t, _, ids = table
    v_target = t.manifest()["version"]  # after epoch 1
    t.merge(delta(spark, [_row("late", 1)]), epoch=2, delete_col="is_del")
    t.delete_where("source = 'web'")
    r = t.restore(v_target)
    assert not r["skipped"]
    # state == time-travel read of the target
    assert _docs(t) == sorted(
        x["doc_id"] for x in t.read(version=v_target).collect()
    )
    man = t.manifest()
    assert man["summary"] == {"op": "restore", "restored_to": v_target}
    # watermark rolled back -> undone epochs re-apply exactly-once
    assert man["last_committed_epoch"] == 1
    rr = t.merge(delta(spark, [_row("late", 1)]), epoch=2,
                 delete_col="is_del")
    assert not rr["skipped"]
    assert "late" in _docs(t)


def test_restore_truncates_change_feed(spark, table):
    t, _, _ = table
    v_target = t.manifest()["version"]
    t.delete_where("source = 'web'")
    t.restore(v_target)
    v_restore = t.manifest()["version"]
    # feed before the restore is gone: consumers must re-snapshot, loudly
    with pytest.raises(ValueError, match="incomplete"):
        t.read_changes(v_target)
    # feed resumes cleanly from the restore commit
    t.merge(delta(spark, [_row("post", 7)]), epoch=2, delete_col="is_del")
    post = t.read_changes(v_restore).collect()
    assert [r["doc_id"] for r in post] == ["post"]


def test_restore_edge_cases(spark, table):
    t, _, _ = table
    cur = t.manifest()["version"]
    assert t.restore(cur)["skipped"]
    with pytest.raises(ValueError, match="table is at"):
        t.restore(cur + 5)
    with pytest.raises(FileNotFoundError):
        t.restore(0)
    # a restore is itself restorable (history preserved, not rewritten)
    t.delete_where("true")
    assert _docs(t) == []
    t.restore(cur)
    assert len(_docs(t)) > 0
    versions = [h["version"] for h in t.history()]
    assert len(versions) == len(set(versions))


# ------------------------------------------------------- DML x MoR deferral
def test_delete_where_defers_under_mor(spark, tmp_path):
    """With the MoR floor off, a small DML delete rides the delta stack
    (no base rewrite) and read() resolves it — DML inherits merge-on-read
    like any CDC commit."""
    t = SnapTable(spark, str(tmp_path / "mor"))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"min_mor_base_bytes": 0, "mor_rewrite_ratio": 1e9,
                    "max_delta_files_per_bucket": 100},
    )
    ids = _ids_by_bucket(spark, 2)
    t.merge(
        delta(spark, [_row(d, i) for i, d in enumerate(ids[0] + ids[1])]),
        epoch=0, delete_col="is_del",
    )
    r = t.delete_where(f"doc_id = '{ids[0][0]}'")
    assert r["buckets_deferred"] == 1 and r["files_rewritten"] == 0
    assert any(f.get("kind") == "delta" for f in t.manifest()["files"])
    assert ids[0][0] not in _docs(t)


def test_replica_converges_after_dml(spark, table, tmp_path):
    """Derived tables key their exactly-once on source VERSIONS, so DML
    commits (which reuse the watermark epoch) replicate like any other
    commit — replica state equals source state after DML + catch-up."""
    from embulk_filter_expand_json_spark.streaming.replicate import replicate

    t, _, ids = table
    dst = str(tmp_path / "replica")
    replicate(spark, t, dst)
    t.update_where("source = 'web'", {"n_tok": "n_tok + 500"})
    t.delete_where(f"doc_id = '{ids[0][0]}'")
    replicate(spark, t, dst)
    got = sorted(
        (r["doc_id"], r["n_tok"])
        for r in SnapTable(spark, dst).read().collect()
    )
    want = sorted((r["doc_id"], r["n_tok"]) for r in t.read().collect())
    assert got == want


def test_aggview_converges_after_dml(spark, table, tmp_path):
    """The incremental aggregate view diffs bucket state between its
    synced VERSION and the current one, so watermark-pinned DML commits
    (update shifting a sum, delete dropping rows) must fold in exactly
    like CDC epochs — pinned against a from-scratch GROUP BY."""
    from embulk_filter_expand_json_spark.streaming.aggview import (
        IncrementalAggView,
    )

    t, _, ids = table
    view = IncrementalAggView(
        spark, t, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    view.sync()
    t.update_where("source = 'web'", {"n_tok": "n_tok + 100"})
    t.delete_where(f"doc_id = '{ids[0][0]}'")
    view.sync()
    got = sorted(tuple(r) for r in view.read().collect())
    # from-scratch GROUP BY, aliased to the view's own column order
    cols = view.read().columns
    want = sorted(
        tuple(r[c] for c in cols)
        for r in t.read().groupBy("source").agg(
            F.count("*").alias(cols[1]),
            F.sum("n_tok").cast("long").alias(cols[2]),
        ).collect()
    )
    assert got == want
