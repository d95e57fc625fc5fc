"""CSV/raw-line sources, hot-key detection + auto strategy, and the
Structured Streaming apply front-end (exactly-once across restarts)."""

import datetime
import json
import os
import time

import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark import expand_json
from embulk_filter_expand_json_spark.operators.dedup_lww import (
    detect_hot_keys,
    lww_dedup,
)
from embulk_filter_expand_json_spark.reference_oracle import replay
from embulk_filter_expand_json_spark.sources.changegen import (
    ChangeGenConfig,
    write_changes,
)
from embulk_filter_expand_json_spark.sources.files import read_csv, read_raw_lines
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable
from embulk_filter_expand_json_spark.streaming.stream_apply import (
    run_streaming_apply,
)


# ------------------------------------------------------------------ sources

def test_read_csv_with_types_and_timestamp(spark, tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text(
        "2015-01-27 19:23:49 +0900\t1\tfoo\t3.2\ttrue\n"
        "2015-01-28 00:00:00 +0000\t2\tbar\t1.5\tfalse\n"
    )
    df = read_csv(
        spark,
        str(p),
        delimiter="\t",
        columns=[
            {"name": "time", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S %z"},
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
        ],
    )
    rows = df.orderBy("id").collect()
    assert rows[0]["time"] == datetime.datetime(2015, 1, 27, 10, 23, 49)
    assert rows[0]["id"] == 1 and rows[0]["score"] == 3.2 and rows[0]["ok"] is True
    assert rows[1]["name"] == "bar" and rows[1]["ok"] is False


def test_read_raw_lines_plus_expand(spark, tmp_path):
    """The reference's bench pipeline shape: raw JSON lines -> expand
    (bench/config_raw.yml + config_with_*_cache.yml)."""
    p = tmp_path / "lines.jsonl"
    p.write_text('{"a": 1, "b": {"c": "x"}}\n{"a": 2}\n')
    df = read_raw_lines(spark, str(p), column_name="json_payload")
    out = expand_json(
        df,
        {
            "json_column_name": "json_payload",
            "expanded_columns": [
                {"name": "a", "type": "long"},
                {"name": "b.c", "type": "string"},
            ],
        },
    )
    rows = out.orderBy("a").collect()
    assert [(r["a"], r["b.c"]) for r in rows] == [(1, "x"), (2, None)]


# ------------------------------------------------------- hot keys / salting

def test_detect_hot_keys_and_auto_strategy(spark):
    rows = [("hot", i) for i in range(5000)] + [
        (f"k{i}", i) for i in range(5000, 6000)
    ]
    df = spark.createDataFrame(rows, "doc_id string, log_offset long")
    hot = detect_hot_keys(df, sample_fraction=0.2, hot_multiplier=10.0)
    assert hot == ["hot"]
    uniform = spark.createDataFrame(
        [(f"k{i % 500}", i) for i in range(2000)], "doc_id string, log_offset long"
    )
    assert detect_hot_keys(uniform, sample_fraction=0.5, hot_multiplier=10.0) == []
    # auto must agree with the explicit strategies
    got = sorted(
        (r["doc_id"], r["log_offset"])
        for r in lww_dedup(df, strategy="auto").collect()
    )
    want = sorted(
        (r["doc_id"], r["log_offset"])
        for r in lww_dedup(df, strategy="window").collect()
    )
    assert got == want


# ------------------------------------------------------------- streaming

CFG = ChangeGenConfig(n_events=2_000, n_docs=100, batch_size=400, seed=3)


def table_state(t: SnapTable) -> dict:
    return {
        r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None)
        for r in t.read().collect()
    }


def test_streaming_apply_matches_oracle(spark, tmp_path):
    log = str(tmp_path / "log")
    write_changes(spark, CFG, log)
    q = run_streaming_apply(
        spark,
        changes_path=log,
        table_path=str(tmp_path / "tbl"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=4,
    )
    q.awaitTermination(120)
    t = SnapTable(spark, str(tmp_path / "tbl"))
    got = table_state(t)
    events = [
        (r["log_offset"], r["op"], r["payload"])
        for r in spark.read.parquet(log).collect()
    ]
    want = replay(events, extra_keys=("lang",))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d]["tokens"], d


def test_streaming_apply_restart_and_new_data(spark, tmp_path):
    log = str(tmp_path / "log2")
    write_changes(spark, CFG, log)
    kw = dict(
        changes_path=log,
        table_path=str(tmp_path / "tbl2"),
        checkpoint_path=str(tmp_path / "ckpt2"),
        num_buckets=4,
    )
    q = run_streaming_apply(spark, **kw)
    q.awaitTermination(120)
    t = SnapTable(spark, str(tmp_path / "tbl2"))
    state1 = table_state(t)
    v1 = t.manifest()["version"]

    # restart with no new data: no new commits (exactly-once across restart)
    q = run_streaming_apply(spark, **kw)
    q.awaitTermination(120)
    assert table_state(t) == state1
    assert t.manifest()["version"] == v1

    # append new data: picked up incrementally from the checkpoint
    extra = ChangeGenConfig(
        n_events=400, n_docs=100, batch_size=400, seed=99
    )
    from embulk_filter_expand_json_spark.sources.changegen import (
        generate_changes,
    )

    (
        generate_changes(spark, extra)
        .withColumn("log_offset", F.col("log_offset") + CFG.n_events)
        .withColumn("epoch", F.lit(CFG.n_events // CFG.batch_size))
        .write.mode("append")
        .partitionBy("epoch")
        .parquet(log)
    )
    q = run_streaming_apply(spark, **kw)
    q.awaitTermination(120)
    assert t.manifest()["version"] > v1
    events = [
        (r["log_offset"], r["op"], r["payload"])
        for r in spark.read.parquet(log).collect()
    ]
    want = replay(events, extra_keys=("lang",))
    got = table_state(t)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d]["tokens"], d


def test_read_csv_skip_header_lines_multifile(spark, tmp_path):
    """Embulk skips N physical lines PER FILE — multi-file input must drop
    the first N rows of EVERY file, not N rows of one partition."""
    from embulk_filter_expand_json_spark.sources.files import read_csv

    d = tmp_path / "csv"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.csv").write_text(
            f"id,name\nunits,text\n{i}00,a{i}\n{i}01,b{i}\n"
        )
    out = read_csv(
        spark,
        str(d),
        columns=[{"name": "v", "type": "long"}, {"name": "s", "type": "string"}],
        skip_header_lines=2,
    )
    rows = sorted((r["v"], r["s"]) for r in out.collect())
    assert rows == [(0, "a0"), (1, "b0"), (100, "a1"),
                    (101, "b1"), (200, "a2"), (201, "b2")]


def test_read_csv_skip_header_lines_split_files(spark, tmp_path):
    """ADVICE r2: the per-file header skip orders rows by
    monotonically_increasing_id, which relies on Spark enumerating a file's
    byte-range splits in offset order. Guard that assumption with files
    large enough to split into MULTIPLE partitions: the skipped rows must
    still be exactly each file's first N physical lines."""
    from embulk_filter_expand_json_spark.sources.files import read_csv

    d = tmp_path / "bigcsv"
    d.mkdir()
    n_rows = 5000
    for i in range(2):
        lines = ["header,x", "units,y"] + [
            f"{i * 100000 + j},r{i}_{j}" for j in range(n_rows)
        ]
        (d / f"f{i}.csv").write_text("\n".join(lines) + "\n")
    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")  # ~5 splits/file
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        out = read_csv(
            spark,
            str(d),
            columns=[{"name": "v", "type": "long"},
                     {"name": "s", "type": "string"}],
            skip_header_lines=2,
        )
        # the scan really did split each file across several partitions
        # (checked on the raw scan: the skip's window shuffle re-partitions)
        assert spark.read.csv(str(d)).rdd.getNumPartitions() > 2
        got = sorted(r["v"] for r in out.collect())
        want = sorted(
            i * 100000 + j for i in range(2) for j in range(n_rows)
        )
        assert got == want  # headers gone, every data row exactly once
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_expand_json_runs_on_streaming_frames(spark, tmp_path, mode):
    """The expansion operator is stateless, so BOTH physical strategies run
    unmodified on a readStream source (Embulk is batch-only; here the same
    plan serves batch and streaming) and match the batch result exactly."""
    import shutil

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / f"exp_stream_{mode}")
    os.makedirs(src)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", os.path.join(src, "e.parquet")
    )
    cfg = {
        "json_column_name": "props",
        "expanded_columns": [{"name": "k", "type": "long"}],
    }
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        expand_json(stream, cfg, mode=mode)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(f"exp_stream_{mode}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(f"exp_stream_{mode}").orderBy("event_id").toPandas()
    want = expand_json(ev, cfg, mode=mode).orderBy("event_id").toPandas()
    assert got.equals(want) and len(got) == 1000


# ------------------------------------------------------------------- jsonl

def test_read_jsonl_types_and_invalid_drop(spark, tmp_path):
    from embulk_filter_expand_json_spark.sources.files import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 1.5, "ok": true}\n'
        'THIS IS NOT JSON\n'
        '{"id": 2, "name": "b", "score": "2.25", "ok": "false"}\n'
        '{"id": 3, "name": null}\n'
    )
    df = read_jsonl(
        spark,
        str(p),
        columns=[
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
        ],
    )
    assert df.columns == ["id", "name", "score", "ok"]
    rows = sorted(df.collect(), key=lambda r: r["id"])
    # the malformed line took the invalid-record channel (dropped); missing
    # keys are NULL; lenient string->double/boolean casts match the
    # expansion operator's semantics (same code path)
    assert [(r["id"], r["name"], r["score"], r["ok"]) for r in rows] == [
        (1, "a", 1.5, True),
        (2, "b", 2.25, False),
        (3, None, None, None),
    ]


def test_read_jsonl_stop_on_invalid_and_keep_doc(spark, tmp_path):
    from embulk_filter_expand_json_spark.sources.files import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1}\nbroken\n')
    with pytest.raises(Exception, match="[Ii]nvalid"):
        read_jsonl(
            spark,
            str(p),
            columns=[{"name": "id", "type": "long"}],
            stop_on_invalid_record=True,
        ).collect()

    good = tmp_path / "good.jsonl"
    good.write_text('{"id": 7, "ts": "2015-01-27 19:23:49 +0900"}\n')
    df = read_jsonl(
        spark,
        str(good),
        columns=[
            {"name": "id", "type": "long"},
            {
                "name": "ts",
                "type": "timestamp",
                "format": "%Y-%m-%d %H:%M:%S %z",
            },
        ],
        keep_document_column="raw",
    )
    r = df.collect()[0]
    assert r["id"] == 7 and r["raw"].startswith('{"id": 7')
    assert r["ts"] == datetime.datetime(2015, 1, 27, 10, 23, 49)
