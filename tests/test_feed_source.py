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
    # a timed-out query would leave a PARTIAL sink and fail the assertion
    # far from the cause — fail here instead
    assert q.awaitTermination(300), "stream did not finish within 300 s"


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


def test_stream_null_fills_pre_evolution_files(spark, tmp_path):
    """ADVICE r4 (high): change files written BEFORE evolve_add_columns
    have fewer columns than the latest manifest schema. The stream must
    align every file to the declared schema (null-fill + reorder + cast),
    mirroring the batch read_changes' spark.read.schema(...) null-fill —
    not hard-fail with a column-count mismatch."""
    from pyspark.sql import types as T

    t = make_table(spark, tmp_path / "t")
    t.merge(
        delta(spark, [("a", [1], 1, "s", False), ("b", [2], 2, "s", False)]),
        epoch=0,
        delete_col="is_del",
    )
    # evolve mid-retention: old change files stay narrow on disk
    assert t.evolve_add_columns([T.StructField("lang", T.StringType(), True)])
    wide = spark.createDataFrame(
        [("c", [3], 3, "s", "en", False)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "lang string, is_del boolean",
    )
    t.merge(wide, epoch=1, delete_col="is_del")

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_stream(spark, tmp_path / "t", out, ckpt)
    got = spark.read.parquet(str(out))
    # parity with the batch path over the same (evolved) window
    assert rows_key(got.select(*t.read_changes(0).columns)) == rows_key(
        t.read_changes(0)
    )
    by_doc = {r["doc_id"]: r for r in got.collect()}
    assert by_doc["a"]["lang"] is None and by_doc["b"]["lang"] is None
    assert by_doc["c"]["lang"] == "en"


def test_stream_max_versions_per_batch(spark, tmp_path):
    """The rate limit caps each micro-batch at N commit versions (Delta's
    maxFilesPerTrigger analogue) from the SECOND batch of a reader's
    lifetime onward. Batch 0 is necessarily uncapped: Spark resolves
    ``latestOffset()`` BEFORE ``initialOffset()`` (verified empirically,
    both triggers), and the Python DataSource API has no admission-control
    variant that sees the start offset — returning anything lower on the
    first call could land BEHIND a restart checkpoint, regressing the
    offset log and replaying data into the sink. So the pin is: an
    initial 2-commit backlog drains in one uncapped batch, then 3 new
    commits drain one-version-per-batch; batch reads ignore the option."""
    import json
    import time

    t = make_table(spark, tmp_path / "t")
    for e in range(2):
        t.merge(
            delta(spark, [(f"k{e}", [e], e, "s", False)]),
            epoch=e,
            delete_col="is_del",
        )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    spark.dataSource.register(SnapTableChangesDataSource)
    q = (
        spark.readStream.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("max_versions_per_batch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 seconds")
        .start()
    )

    def sink_count():
        try:
            return spark.read.parquet(str(out)).count()
        except Exception:
            return 0

    def wait_rows(n, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if sink_count() >= n:
                return
            time.sleep(1)
        raise AssertionError(f"sink never reached {n} rows")

    try:
        wait_rows(2)  # uncapped batch 0 drains the whole initial backlog
        for e in range(2, 5):
            t.merge(
                delta(spark, [(f"k{e}", [e], e, "s", False)]),
                epoch=e,
                delete_col="is_del",
            )
        wait_rows(5)
    finally:
        q.stop()

    got = spark.read.parquet(str(out))
    assert rows_key(got) == rows_key(t.read_changes(0))

    # parse the checkpointed offset log: every batch past batch 0 may
    # advance at most 1 commit version — the 3 catch-up commits cannot
    # ride one micro-batch
    offs = sorted(
        int(n) for n in os.listdir(str(ckpt / "offsets")) if n.isdigit()
    )
    ends = []
    for n in offs:
        with open(str(ckpt / "offsets" / str(n))) as f:
            ends.append(json.loads(f.read().splitlines()[-1])["version"])
    assert len(ends) >= 4  # batch 0 + >=3 capped catch-up batches
    deltas = [b - a for a, b in zip(ends, ends[1:])]
    assert all(d <= 1 for d in deltas), (ends, deltas)
    assert ends[0] >= 3  # batch 0 covered the whole 2-commit backlog

    # the batch flavor must NOT truncate under the same option
    full = (
        spark.read.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("max_versions_per_batch", "1")
        .load()
    )
    assert rows_key(full) == rows_key(t.read_changes(0))


def test_stream_max_bytes_per_batch(spark, tmp_path):
    """Byte-based admission (Delta's maxBytesPerTrigger): a 1-byte budget
    admits exactly one commit version per batch past batch 0, and a
    mid-stream evolve commit (a version with NO change entry, hence zero
    change bytes) must not wedge the cap. Batch reads ignore the option."""
    import json
    import time

    from pyspark.sql import types as T

    t = make_table(spark, tmp_path / "t")
    t.merge(
        delta(spark, [("k0", [0], 0, "s", False)]), epoch=0,
        delete_col="is_del",
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    spark.dataSource.register(SnapTableChangesDataSource)
    q = (
        spark.readStream.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("max_bytes_per_batch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 seconds")
        .start()
    )

    def sink_count():
        try:
            return spark.read.parquet(str(out)).count()
        except Exception:
            return 0

    def wait_rows(n, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if sink_count() >= n:
                return
            time.sleep(1)
        raise AssertionError(f"sink never reached {n} rows")

    try:
        wait_rows(1)  # batch 0 drains the initial commit
        t.merge(
            delta(spark, [("k1", [1], 1, "s", False)]), epoch=1,
            delete_col="is_del",
        )
        # metadata-only commit: no change entry, zero change bytes —
        # the byte cap must step over it instead of wedging below it
        assert t.evolve_add_columns(
            [T.StructField("lang", T.StringType(), True)]
        )
        t.merge(
            spark.createDataFrame(
                [("k2", [2], 2, "s", "en", False)],
                "doc_id string, tokens array<int>, n_tok int, "
                "source string, lang string, is_del boolean",
            ),
            epoch=2,
            delete_col="is_del",
        )
        # k1 still drains under the pre-evolution schema; k2's file then
        # carries the NEW column, which a running stream cannot widen to —
        # the source must fail loudly (never silently drop the column)
        wait_rows(2)
        # awaitTermination raises the reader's error once the widened file
        # is read; a clean timeout (return False, no raise) means the
        # stream silently survived, which pytest.raises reports as failure
        with pytest.raises(Exception, match="evolved"):
            q.awaitTermination(120)
    finally:
        q.stop()

    # restart on the SAME checkpoint: the new reader declares the evolved
    # schema, replays the failed batch from its WAL offset, and null-fills
    # pre-evolution files — the documented recovery path
    q2 = (
        spark.readStream.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("max_bytes_per_batch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        wait_rows(3)
    finally:
        q2.stop()

    want = t.read_changes(0)
    got = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(out))
        .select(*want.columns)
    )
    assert rows_key(got) == rows_key(want)

    # every post-0 batch with data admitted exactly one commit version
    offs = sorted(
        int(n) for n in os.listdir(str(ckpt / "offsets")) if n.isdigit()
    )
    ends = []
    for n in offs:
        with open(str(ckpt / "offsets" / str(n))) as f:
            ends.append(json.loads(f.read().splitlines()[-1])["version"])
    # the two catch-up merges (k1, k2) cannot ride one micro-batch: some
    # batch boundary must fall strictly between their commit versions
    v_k1 = 3  # create=1, merge k0=2, merge k1=3, evolve=4, merge k2=5
    assert any(v_k1 <= e < 5 for e in ends[1:]), ends

    full = (
        spark.read.format("snaptable_changes")
        .option("path", str(tmp_path / "t"))
        .option("max_bytes_per_batch", "1")
        .load()
    )
    assert rows_key(full) == rows_key(t.read_changes(0))
