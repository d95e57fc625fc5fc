"""Structured Streaming source over the change data feed (Spark 4 Python
DataSource API): parity with the batch read_changes, checkpoint resume,
since_version, and the loud past-retention failure."""

import os

import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.feed_source import (
    SnapTableChangesDataSource,
)
from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def make_table(spark, path, **props):
    t = SnapTable(spark, str(path))
    t.create(
        SEQUENCES_SCHEMA,
        key="doc_id",
        num_buckets=4,
        properties={"changelog": True, **props},
    )
    return t


def run_stream(spark, table_path, out_dir, ckpt, **options):
    spark.dataSource.register(SnapTableChangesDataSource)
    reader = spark.readStream.format("snaptable_changes").option(
        "path", str(table_path)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def rows_key(df):
    return sorted(map(repr, df.collect()))


def test_stream_matches_batch_read_changes_and_resumes(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge(
        delta(spark, [("a", [1], 1, "s", False), ("b", [2], 2, "s", False)]),
        epoch=0,
        delete_col="is_del",
    )
    t.merge(
        delta(spark, [("a", [9], 9, "s2", False), ("b", None, None, None, True)]),
        epoch=1,
        delete_col="is_del",
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_stream(spark, tmp_path / "t", out, ckpt)
    got = spark.read.parquet(str(out))
    assert rows_key(got) == rows_key(t.read_changes(0))
    assert set(got.columns) == set(SEQUENCES_SCHEMA.fieldNames()) | {
        "_change_type", "_commit_version", "_commit_epoch"
    }

    # resume from the Spark checkpoint: exactly the NEW commit arrives
    t.merge(
        delta(spark, [("c", [3], 3, "s", False)]), epoch=2, delete_col="is_del"
    )
    run_stream(spark, tmp_path / "t", out, ckpt)
    got2 = spark.read.parquet(str(out))
    assert rows_key(got2) == rows_key(t.read_changes(0))
    assert got2.count() == got.count() + 1


def test_stream_since_version_option(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge(
        delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del"
    )
    v_after_first = t.manifest()["version"]
    t.merge(
        delta(spark, [("b", [2], 2, "s", False)]), epoch=1, delete_col="is_del"
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_stream(
        spark, tmp_path / "t", out, ckpt, since_version=str(v_after_first)
    )
    got = spark.read.parquet(str(out))
    assert rows_key(got) == rows_key(t.read_changes(v_after_first))
    assert [r["doc_id"] for r in got.collect()] == ["b"]


def test_stream_fails_loudly_past_retention(spark, tmp_path):
    """A consumer whose checkpointed offset predates the retained window
    must error (Delta CDF contract), never silently skip changes."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = make_table(spark, tmp_path / "t", changelog_keep=2)
    t.merge(
        delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del"
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_stream(spark, tmp_path / "t", out, ckpt)  # offset now at v2

    # 3 more commits with keep=2 -> the v2..v3 entries are trimmed
    for e in range(1, 4):
        t.merge(
            delta(spark, [(f"k{e}", [e], e, "s", False)]),
            epoch=e,
            delete_col="is_del",
        )
    with pytest.raises(StreamingQueryException, match="feed incomplete"):
        run_stream(spark, tmp_path / "t", out, ckpt)
        raise AssertionError("stream must not succeed past retention")


def test_batch_read_matches_read_changes(spark, tmp_path):
    """spark.read.format('snaptable_changes') — the batch flavor — must
    equal read_changes over the same window, including since_version."""
    t = make_table(spark, tmp_path / "t")
    t.merge(
        delta(spark, [("a", [1], 1, "s", False), ("b", [2], 2, "s", False)]),
        epoch=0,
        delete_col="is_del",
    )
    v1 = t.manifest()["version"]
    t.merge(
        delta(spark, [("a", None, None, None, True), ("c", [3], 3, "s", False)]),
        epoch=1,
        delete_col="is_del",
    )
    spark.dataSource.register(SnapTableChangesDataSource)
    full = (
        spark.read.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .load()
    )
    assert rows_key(full) == rows_key(t.read_changes(0))
    tail = (
        spark.read.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("since_version", str(v1))
        .load()
    )
    assert rows_key(tail) == rows_key(t.read_changes(v1))
