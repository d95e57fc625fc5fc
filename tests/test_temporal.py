"""enrich_as_of — events joined to the table state current at each event's
time, reconstructed from the change feed + commit history (no snapshot
scans). Ground truth: per-event time travel via read(as_of_ts=...) /
lookup(version=...), row by row.
"""

import time

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable
from embulk_filter_expand_json_spark.streaming.temporal import enrich_as_of


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


@pytest.fixture()
def versioned(spark, tmp_path):
    """Three commits with distinct wall-clock times: insert a+b, update a,
    delete b."""
    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"changelog": True},
    )
    stamps = []
    t.merge(
        delta(spark, [("a", [1], 1, "s0", False), ("b", [2], 1, "s0", False)]),
        epoch=0, delete_col="is_del",
    )
    stamps.append(t.manifest()["committed_at"])
    time.sleep(0.05)
    t.merge(delta(spark, [("a", [9], 9, "s1", False)]), epoch=1,
            delete_col="is_del")
    stamps.append(t.manifest()["committed_at"])
    time.sleep(0.05)
    t.merge(delta(spark, [("b", None, None, None, True)]), epoch=2,
            delete_col="is_del")
    stamps.append(t.manifest()["committed_at"])
    return t, stamps


def test_enrich_matches_time_travel(spark, versioned):
    t, (t0, t1, t2) = versioned
    eps = 1e-3
    events = spark.createDataFrame(
        [
            (1, "a", t0 - eps),   # before any commit -> no state
            (2, "a", t0 + eps),   # v after epoch 0 -> tokens [1]
            (3, "a", t1 + eps),   # after the update -> [9]
            (4, "b", t1 + eps),   # b still alive -> [2]
            (5, "b", t2 + eps),   # after the delete -> gone
            (6, "zz", t2 + eps),  # never existed
        ],
        "event_id long, doc_id string, ts double",
    )
    got = {
        r["event_id"]: (
            list(r["tokens"]) if r["tokens"] is not None else None,
            r["source"],
        )
        for r in enrich_as_of(events, t, on="doc_id", event_time="ts").collect()
    }
    assert got == {
        1: (None, None),
        2: ([1], "s0"),
        3: ([9], "s1"),
        4: ([2], "s0"),
        5: (None, None),
        6: (None, None),
    }
    # ground truth the non-trivial rows against real time travel
    assert t.read(as_of_ts=t0 + eps).filter("doc_id='a'").first()["tokens"] == [1]
    assert t.read(as_of_ts=t2 + eps).filter("doc_id='b'").count() == 0


def test_enrich_requires_merge_key_and_clean_columns(spark, versioned):
    t, _ = versioned
    ev = spark.createDataFrame([(1, "a", 0.0)], "event_id long, k string, ts double")
    with pytest.raises(ValueError, match="merge key"):
        enrich_as_of(ev, t, on="k", event_time="ts")
    bad = spark.createDataFrame(
        [("a", 0.0, "x")], "doc_id string, ts double, _change_type string"
    )
    with pytest.raises(ValueError, match="_change_type"):
        enrich_as_of(bad, t, on="doc_id", event_time="ts")


def test_enrich_suffixes_colliding_payload_columns(spark, versioned):
    t, (t0, _t1, _t2) = versioned
    events = spark.createDataFrame(
        [(1, "a", t0 + 1e-3, "mine")],
        "event_id long, doc_id string, ts double, source string",
    )
    out = enrich_as_of(events, t, on="doc_id", event_time="ts")
    row = out.first()
    assert row["source"] == "mine" and row["source_r"] == "s0"
