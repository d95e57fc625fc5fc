"""SnapTable time-travel and compaction."""

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
