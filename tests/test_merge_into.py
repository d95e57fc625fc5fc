"""Conditional MERGE INTO grammar (SnapTable.merge_into) — the full
Delta/Iceberg MERGE surface over the engine's staged-commit machinery.

Contracts under test:
- clause semantics: DELETE-beats-UPDATE precedence, conditions over the
  ``s``/``t`` aliases, matched rows firing no clause are true NO-OPs,
  NULL conditions are false, WHEN NOT MATCHED condition filters inserts;
- the out-of-order CDC guard (``s.seq > t.seq``-style) — the row-level
  idempotence pattern a binlog consumer needs;
- epoch mode advances the watermark exactly-once; DML mode pins it and
  recomputes on overlapping races (same contract as delete/update_where);
- the change feed carries delete pre-images and update after-images.
"""

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

from tests.test_concurrency import delta, inject_before_publish


def _row(doc_id, tok, n_tok=1, source="s", is_del=False):
    return (doc_id, [tok], n_tok, source, is_del)


def src(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=4,
        properties={"changelog": True},
    )
    t.merge(
        delta(spark, [_row(f"k{i}", i, n_tok=10 * i) for i in range(1, 6)]),
        epoch=0, delete_col="is_del",
    )
    return t


def _state(t):
    return {r["doc_id"]: r for r in t.read().collect()}


def test_insert_only_merge(spark, table):
    t = table
    t.merge_into(src(spark, [("k1", [9], 999, "x"), ("k9", [9], 9, "new")]))
    rows = _state(t)
    assert rows["k9"]["source"] == "new"          # unmatched inserted
    assert rows["k1"]["n_tok"] == 10              # matched: NO-OP (no clause)
    assert t.manifest()["summary"]["op"] == "merge-into"


def test_conditional_update_out_of_order_guard(spark, table):
    t = table
    # k2 arrives with a LOWER n_tok (stale), k3 with a higher one (fresh)
    t.merge_into(
        src(spark, [("k2", [0], 5, "stale"), ("k3", [0], 999, "fresh")]),
        when_matched_update={"n_tok": "s.n_tok", "source": "s.source"},
        when_matched_update_condition="s.n_tok > t.n_tok",
        when_not_matched_insert=False,
    )
    rows = _state(t)
    assert rows["k2"]["n_tok"] == 20 and rows["k2"]["source"] == "s"
    assert rows["k3"]["n_tok"] == 999 and rows["k3"]["source"] == "fresh"


def test_delete_beats_update_and_mixed_clauses(spark, table):
    t = table
    t.merge_into(
        src(spark, [("k1", [0], 1, "del"), ("k2", [0], 2, "upd"),
                    ("k8", [8], 8, "ins")]),
        when_matched_update={"source": "s.source"},
        when_matched_delete_condition="s.source = 'del'",
    )
    rows = _state(t)
    assert "k1" not in rows                       # delete fired (beats update)
    assert rows["k2"]["source"] == "upd"          # update fired
    assert rows["k8"]["source"] == "ins"          # insert fired


def test_set_expressions_see_both_sides(spark, table):
    t = table
    t.merge_into(
        src(spark, [("k4", [0], 7, "x")]),
        when_matched_update={"n_tok": "t.n_tok + s.n_tok",
                             "source": "concat(t.source, '+', s.source)"},
        when_not_matched_insert=False,
    )
    r = _state(t)["k4"]
    assert r["n_tok"] == 47 and r["source"] == "s+x"


def test_not_matched_condition_filters_inserts(spark, table):
    t = table
    t.merge_into(
        src(spark, [("k8", [0], 8, "yes"), ("k9", [0], 9, "no")]),
        when_not_matched_condition="s.source = 'yes'",
    )
    rows = _state(t)
    assert "k8" in rows and "k9" not in rows


def test_null_condition_is_false(spark, table):
    t = table
    t.merge_into(
        src(spark, [("k5", [0], None, "x")]),
        when_matched_update={"source": "s.source"},
        when_matched_update_condition="s.n_tok > t.n_tok",  # NULL -> false
        when_not_matched_insert=False,
    )
    assert _state(t)["k5"]["source"] == "s"


def test_epoch_mode_advances_watermark_exactly_once(spark, table):
    t = table
    r = t.merge_into(
        src(spark, [("k8", [8], 8, "e")]), epoch=1,
    )
    assert not r["skipped"]
    assert t.manifest()["last_committed_epoch"] == 1
    # exactly-once: re-applying epoch 1 is a recorded no-op
    r2 = t.merge_into(src(spark, [("k7", [7], 7, "e")]), epoch=1)
    assert r2["skipped"]
    assert "k7" not in _state(t)


def test_dml_mode_pins_watermark(spark, table):
    t = table
    t.merge_into(src(spark, [("k8", [8], 8, "d")]))
    assert t.manifest()["last_committed_epoch"] == 0
    # next pipeline epoch still applies
    assert not t.merge(
        delta(spark, [_row("k9", 9)]), epoch=1, delete_col="is_del"
    )["skipped"]


def test_feed_pre_and_after_images(spark, table):
    t = table
    v0 = t.manifest()["version"]
    t.merge_into(
        src(spark, [("k1", [0], 111, "upd"), ("k2", [0], 0, "del")]),
        when_matched_update={"n_tok": "s.n_tok"},
        when_matched_delete_condition="s.source = 'del'",
        when_not_matched_insert=False,
    )
    ch = {r["doc_id"]: r for r in t.read_changes(v0).collect()}
    assert ch["k1"]["_change_type"] == "upsert" and ch["k1"]["n_tok"] == 111
    # delete carries the pre-image (target values), not the source row
    assert ch["k2"]["_change_type"] == "delete" and ch["k2"]["n_tok"] == 20


def test_dml_race_recomputes_guard(spark, table, tmp_path):
    """Rival bumps t.n_tok above the incoming value before our publish:
    the recomputed guard must then reject the update."""
    t = table
    path = t.path
    inject_before_publish(
        t,
        lambda: SnapTable(spark, path).merge(
            delta(spark, [_row("k1", 0, n_tok=5000)]), epoch=1,
            delete_col="is_del",
        ),
    )
    t.merge_into(
        src(spark, [("k1", [0], 500, "mine")]),
        when_matched_update={"n_tok": "s.n_tok", "source": "s.source"},
        when_matched_update_condition="s.n_tok > t.n_tok",
        when_not_matched_insert=False,
    )
    r = _state(t)["k1"]
    assert r["n_tok"] == 5000 and r["source"] != "mine"


def test_validation_errors(spark, table):
    t = table
    with pytest.raises(ValueError, match="lacks the merge key"):
        t.merge_into(spark.createDataFrame([(1,)], "n_tok int"))
    with pytest.raises(ValueError, match="reassign the merge key"):
        t.merge_into(src(spark, [("k1", [0], 1, "s")]),
                     when_matched_update={"doc_id": "'x'"})
    with pytest.raises(ValueError, match="no WHEN clause"):
        t.merge_into(src(spark, [("k1", [0], 1, "s")]),
                     when_not_matched_insert=False)
    with pytest.raises(ValueError, match="without when_matched_update"):
        t.merge_into(src(spark, [("k1", [0], 1, "s")]),
                     when_matched_update_condition="true")


def test_source_missing_columns_null_fill(spark, table):
    t = table
    thin = spark.createDataFrame([("k8",)], "doc_id string")
    t.merge_into(thin)
    r = _state(t)["k8"]
    assert r["n_tok"] is None and r["tokens"] is None
