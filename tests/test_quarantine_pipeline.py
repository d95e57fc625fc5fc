"""CdcPipeline quarantine_path — the dead-letter table end-to-end.

Contract: every change record the replay silently drops (malformed JSON,
failed cast, NULL merge key) lands in the side SnapTable exactly once,
with a reason; the main table's final state is IDENTICAL with and without
quarantine enabled; resume/replay leaves no duplicates.
"""

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.sources.changegen import (
    ChangeGenConfig,
    generate_changes,
    write_changes,
)
from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

# crank the corruption rates so every reason class occurs in 2k events
CFG = ChangeGenConfig(
    n_events=2_000,
    n_docs=100,
    batch_size=500,
    seed=11,
    p_malformed=0.02,
    p_badtype=0.03,
)


@pytest.fixture(scope="module")
def qlog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qchanges") / "log")
    write_changes(spark, CFG, path)
    return path


def test_quarantine_captures_exactly_the_dropped_rows(spark, qlog, tmp_path):
    pipe = CdcPipeline(
        spark,
        qlog,
        str(tmp_path / "table"),
        num_buckets=4,
        quarantine_path=str(tmp_path / "dlq"),
    )
    metrics = pipe.run()
    assert sum(m.quarantined for m in metrics) > 0

    quar = pipe.quarantine.read()
    reasons = {
        r["_invalid_reason"]: r["n"]
        for r in quar.groupBy("_invalid_reason").agg(F.count("*").alias("n")).collect()
    }
    assert set(reasons) == {"malformed_document", "cast_error"}

    # exact complement: quarantined offsets == all offsets - offsets that
    # survived into the expansion (recompute the generator's plant rules)
    changes = generate_changes(spark, CFG)
    expected_bad = (
        changes.filter(
            F.get_json_object("payload", "$").isNull()
            | F.get_json_object("payload", "$.doc_id").isNull()
            | (
                # tokens key present but not parseable JSON -> cast error;
                # an ABSENT tokens key is a legitimate null (delete ops)
                F.get_json_object("payload", "$.tokens").isNotNull()
                & F.to_json(
                    F.try_parse_json(F.get_json_object("payload", "$.tokens"))
                ).isNull()
            )
        )
        .select("log_offset")
        .collect()
    )
    assert {r["log_offset"] for r in quar.select("log_offset").collect()} == {
        r["log_offset"] for r in expected_bad
    }
    # per-epoch metric equals the table's rows for that epoch
    assert sum(m.quarantined for m in metrics) == quar.count()

    # main-table state is identical to a quarantine-less replay
    ref = CdcPipeline(spark, qlog, str(tmp_path / "ref"), num_buckets=4)
    ref.run()
    a = sorted(map(tuple, pipe.table.read().collect()))
    b = sorted(map(tuple, ref.table.read().collect()))
    assert a == b


def test_quarantine_replay_is_exactly_once(spark, qlog, tmp_path):
    kw = dict(num_buckets=4, quarantine_path=str(tmp_path / "dlq"))
    pipe = CdcPipeline(spark, qlog, str(tmp_path / "table"), **kw)
    pipe.run()
    n = pipe.quarantine.read().count()
    assert n > 0
    # a fresh pipeline over the same paths replays nothing
    again = CdcPipeline(spark, qlog, str(tmp_path / "table"), **kw)
    metrics = again.run()
    assert all(m.skipped for m in metrics) or metrics == []
    assert again.quarantine.read().count() == n

    # the dead letters are REPLAYABLE: log_offset is the key, so a fixed
    # producer payload can be re-applied downstream (spot-check shape)
    row = again.quarantine.read().first()
    assert row["payload"] is not None and row["log_offset"] is not None


def test_null_merge_key_reason(spark, tmp_path):
    changes = spark.createDataFrame(
        [
            (0, 0, "U", '{"doc_id": "a", "tokens": [1], "n_tok": 1, "source": "s"}'),
            (1, 0, "U", '{"tokens": [2], "n_tok": 1, "source": "s"}'),  # no key
            (2, 0, "U", None),  # null payload -> no key either
        ],
        "log_offset long, epoch long, op string, payload string",
    )
    import os

    log = str(tmp_path / "log")
    changes.write.partitionBy("epoch").parquet(log)
    pipe = CdcPipeline(
        spark,
        log,
        str(tmp_path / "t"),
        num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()
    got = {
        r["log_offset"]: r["_invalid_reason"]
        for r in pipe.quarantine.read().collect()
    }
    assert got == {1: "null_merge_key", 2: "null_merge_key"}
    assert [r["doc_id"] for r in pipe.table.read().collect()] == ["a"]
