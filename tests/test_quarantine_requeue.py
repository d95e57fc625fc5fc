"""Dead-letter redrive: CdcPipeline.requeue_quarantine.

The contract pinned here: after a producer fix, redriving the quarantine
must land the table in EXACTLY the state a from-scratch replay of the
repaired log would produce — repaired rows win only where they would have
won LWW all along, stale repairs are discarded, still-invalid rows stay
quarantined, and the CDC watermark never moves (a redrive between two
epochs must not make the pipeline skip source batches).
"""

import pytest
from pyspark.sql import Row, functions as F

from embulk_filter_expand_json_spark.sources.changegen import (
    ChangeGenConfig,
    write_changes,
)
from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline


FIX_BADTYPE = lambda df: df.withColumn(  # noqa: E731 — the producer fix
    "payload",
    F.regexp_replace("payload", '"tokens":"oops"', '"tokens":[]'),
)


def _state(pipe):
    cols = ["doc_id", "tokens", "n_tok", "source"]
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in pipe.table.read().select(cols).collect()
    }


def test_requeue_matches_fixed_from_scratch_replay(spark, tmp_path):
    cfg = ChangeGenConfig(
        n_events=6000, n_docs=400, batch_size=1500, seed=13,
        p_badtype=0.05, p_malformed=0.01,
    )
    log = str(tmp_path / "log")
    write_changes(spark, cfg, log)

    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=4,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()
    wm = pipe.last_committed_epoch()
    res = pipe.requeue_quarantine(FIX_BADTYPE)

    # oracle: replay a log whose bad-typed rows were never broken
    fixedlog = str(tmp_path / "fixedlog")
    FIX_BADTYPE(spark.read.parquet(log)).write.partitionBy("epoch").parquet(
        fixedlog
    )
    oracle = CdcPipeline(
        spark, fixedlog, str(tmp_path / "t2"), num_buckets=4,
        quarantine_path=str(tmp_path / "dlq2"),
    )
    oracle.run()

    assert _state(pipe) == _state(oracle)
    assert pipe.last_committed_epoch() == wm  # watermark pinned
    assert res["quarantined"] > 0 and res["repaired"] > 0
    assert res["winners"] == res["applied"] + res["stale"]
    # only still-invalid rows (malformed/null-key) remain in the DLQ
    assert pipe.quarantine.read().count() == res["still_invalid"]
    assert (
        pipe.quarantine.read()
        .filter(F.col("_invalid_reason") == "cast_error")
        .count()
        == 0
    )
    # a second redrive with the same fix is a no-op (idempotent lifecycle)
    res2 = pipe.requeue_quarantine(FIX_BADTYPE)
    assert res2["repaired"] == 0 and res2["applied"] == 0
    assert _state(pipe) == _state(oracle)


def _handmade_log(spark, path, rows):
    spark.createDataFrame(
        rows, "log_offset long, epoch long, op string, payload string"
    ).write.partitionBy("epoch").parquet(path)


def test_requeue_stale_rows_never_stomp_newer_state(spark, tmp_path):
    """A repaired row older than the doc's applied valid winner must be
    discarded (and removed from the DLQ as done); a repaired row that IS
    the global winner applies; a repaired null-key delete deletes."""
    rows = [
        # doc X: bad-typed at 5, then a VALID upsert at 10 -> repair is stale
        Row(5, 0, "U", '{"doc_id":"X","tokens":"oops","n_tok":1,"source":"a"}'),
        Row(10, 0, "U", '{"doc_id":"X","tokens":[7],"n_tok":7,"source":"a"}'),
        # doc Y: ONLY a bad-typed row -> repair inserts it
        Row(7, 0, "U", '{"doc_id":"Y","tokens":"oops","n_tok":2,"source":"b"}'),
        # doc Z: valid upsert at 1, then a null-key delete at 9 -> after the
        # fix injects the key, the delete wins and Z disappears
        Row(1, 0, "U", '{"doc_id":"Z","tokens":[1],"n_tok":1,"source":"c"}'),
        Row(9, 0, "D", "{}"),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()
    assert {r.doc_id for r in pipe.table.read().collect()} == {"X", "Z"}

    def fix(df):
        df = FIX_BADTYPE(df)
        return df.withColumn(
            "payload",
            F.when(
                (F.col("op") == "D")
                & F.get_json_object("payload", "$.doc_id").isNull(),
                F.lit('{"doc_id":"Z"}'),
            ).otherwise(F.col("payload")),
        )

    res = pipe.requeue_quarantine(fix)
    assert res == {
        "quarantined": 3, "repaired": 3, "still_invalid": 0,
        "winners": 3, "applied": 2, "stale": 1,
    }
    got = {r.doc_id: r.n_tok for r in pipe.table.read().collect()}
    assert got == {"X": 7, "Y": 2}  # X kept its newer state; Z deleted
    assert pipe.quarantine.read().count() == 0


def test_requeue_guards(spark, tmp_path):
    rows = [Row(1, 0, "U", '{"doc_id":"A","tokens":[1],"n_tok":1,"source":"s"}')]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    no_dlq = CdcPipeline(spark, log, str(tmp_path / "t0"), num_buckets=2)
    no_dlq.run()
    with pytest.raises(ValueError, match="quarantine"):
        no_dlq.requeue_quarantine()

    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t1"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    # quarantine table never materialized (no bad rows): no-op dict
    pipe.run()
    res = pipe.requeue_quarantine()
    assert res["quarantined"] == 0 and res["applied"] == 0


def test_requeue_rejects_column_dropping_fix(spark, tmp_path):
    rows = [
        Row(1, 0, "U", '{"doc_id":"A","tokens":"oops","n_tok":1,"source":"s"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()
    with pytest.raises(ValueError, match="required column"):
        pipe.requeue_quarantine(lambda df: df.drop("payload"))


def test_requeue_evolves_new_keys_from_repair(spark, tmp_path):
    """A repair that introduces a new payload key rides the same additive
    schema-evolution policy as ingest."""
    rows = [
        Row(1, 0, "U", '{"doc_id":"A","tokens":"oops","n_tok":1,"source":"s"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()

    def fix(df):
        return df.withColumn(
            "payload",
            F.regexp_replace(
                "payload", '"tokens":"oops"', '"tokens":[9],"lang":"en"'
            ),
        )

    res = pipe.requeue_quarantine(fix)
    assert res["applied"] == 1
    row = pipe.table.read().collect()[0]
    assert row.lang == "en" and row.tokens == [9]


def test_requeue_cli_verb(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import maintain

    rows = [
        Row(1, 0, "U", '{"doc_id":"A","tokens":"oops","n_tok":4,"source":"s"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = maintain.run(spark, [
            "requeue", "--table", str(tmp_path / "t"),
            "--changes", log, "--quarantine", str(tmp_path / "dlq"),
            "--fix-set",
            "payload=regexp_replace(payload, '\"tokens\":\"oops\"', "
            "'\"tokens\":[]')",
        ])
    assert rc == 0
    res = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["applied"] == 1
    assert {r.doc_id for r in pipe.table.read().collect()} == {"A"}


def test_all_invalid_epoch_replays_cleanly(spark, tmp_path):
    """An epoch whose every row is invalid (producer meltdown) must commit
    cleanly with zero upserts — AQE's empty-relation propagation prunes the
    pruned-CollectMetrics observations downstream of the invalid-drop, and
    the pipeline must read that as zero, not crash (regression: _obs_row)."""
    rows = [
        Row(1, 0, "U", '{"doc_id":"A","tokens":"oops","n_tok":1,"source":"s"}'),
        Row(2, 0, "U", '{"doc_id":"B","tokens":"oops","n_tok":2,"source":"s"}'),
        Row(3, 1, "U", '{"doc_id":"C","tokens":[3],"n_tok":3,"source":"s"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    metrics = pipe.run()
    m0 = next(m for m in metrics if m.epoch == 0)
    assert m0.invalid == 2 and m0.upserts == 0 and m0.deletes == 0
    assert m0.quarantined == 2
    assert {r.doc_id for r in pipe.table.read().collect()} == {"C"}
    # and the quarantined meltdown redrives once the producer fix lands
    res = pipe.requeue_quarantine(FIX_BADTYPE)
    assert res["applied"] == 2
    assert {r.doc_id for r in pipe.table.read().collect()} == {"A", "B", "C"}


def test_second_redrive_cannot_stomp_first_redrive(spark, tmp_path):
    """Rows applied by a PREVIOUS redrive exist only as DML (invisible to
    the valid-rows-of-the-log guard scan) — the redrive ledger must stop a
    later redrive from overwriting them with an older-offset repair."""
    rows = [
        # doc X: bad-typed at 5 AND at 10; no valid row at all
        Row(5, 0, "U", '{"doc_id":"X","tokens":"oops","n_tok":5,"source":"a"}'),
        Row(10, 0, "U", '{"doc_id":"X","tokens":"oops","n_tok":10,"source":"a"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
    )
    pipe.run()
    assert pipe.table.read().count() == 0

    # redrive 1 repairs ONLY the offset-10 row
    fix10 = lambda df: df.withColumn(  # noqa: E731
        "payload",
        F.when(
            F.col("log_offset") == 10,
            F.regexp_replace("payload", '"tokens":"oops"', '"tokens":[]'),
        ).otherwise(F.col("payload")),
    )
    r1 = pipe.requeue_quarantine(fix10)
    assert r1["applied"] == 1 and r1["still_invalid"] == 1
    assert {r.n_tok for r in pipe.table.read().collect()} == {10}

    # redrive 2 repairs everything left (the offset-5 row): it must be
    # STALE against the ledger, never stomping the offset-10 state
    r2 = pipe.requeue_quarantine(FIX_BADTYPE)
    assert r2["repaired"] == 1 and r2["applied"] == 0 and r2["stale"] == 1
    assert {r.n_tok for r in pipe.table.read().collect()} == {10}
    assert pipe.quarantine.read().count() == 0


def test_redrive_applies_expectations(spark, tmp_path):
    """Repaired rows face the pipeline's expectations exactly as an epoch
    would: drop excludes, fail aborts pre-mutation."""
    rows = [
        Row(1, 0, "U", '{"doc_id":"A","tokens":"oops","n_tok":-1,"source":"s"}'),
        Row(2, 0, "U", '{"doc_id":"B","tokens":"oops","n_tok":3,"source":"s"}'),
    ]
    log = str(tmp_path / "log")
    _handmade_log(spark, log, rows)
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq"),
        expectations=[("tok_pos", "n_tok > 0", "drop")],
    )
    pipe.run()
    res = pipe.requeue_quarantine(FIX_BADTYPE)
    assert res["expectation_tok_pos"] == 1
    assert res["applied"] == 1  # only B survives the drop expectation
    # the dropped winner reports as a DROP, not as 'stale' (it was never
    # adjudicated against the applied-offset guard)
    assert res["expectation_dropped"] == 1 and res["stale"] == 0
    assert {r.doc_id for r in pipe.table.read().collect()} == {"B"}
    assert pipe.quarantine.read().count() == 0  # adjudicated rows leave

    # fail-action aborts BEFORE any mutation
    pipe2 = CdcPipeline(
        spark, log, str(tmp_path / "t2"), num_buckets=2,
        quarantine_path=str(tmp_path / "dlq2"),
        expectations=[("tok_pos", "n_tok > 0", "fail")],
    )
    pipe2.run()
    from embulk_filter_expand_json_spark.streaming.pipeline import (
        ExpectationFailed,
    )

    with pytest.raises(ExpectationFailed, match="tok_pos"):
        pipe2.requeue_quarantine(FIX_BADTYPE)
    assert pipe2.table.read().count() == 0  # nothing applied
    assert pipe2.quarantine.read().count() == 2  # nothing removed


def test_obs_row_swallows_only_pruned_metrics_assertion():
    from py4j.protocol import Py4JJavaError

    from embulk_filter_expand_json_spark.streaming.pipeline import _obs_row

    class _Err(Py4JJavaError):
        def __init__(self, text):  # skip Py4JJavaError's java plumbing
            self._t = text

        def __str__(self):
            return self._t

    class _Obs:
        def __init__(self, err):
            self._err = err

        @property
        def get(self):
            raise self._err

    assert _obs_row(_Obs(_Err(
        "An error occurred while calling z:...PythonSQLUtils.toPyRow.\n"
        ": java.lang.AssertionError: assertion failed"
    ))) == {}
    # either fragment ALONE is some other JVM failure and must re-raise
    with pytest.raises(Py4JJavaError, match="OutOfMemory"):
        _obs_row(_Obs(_Err(
            "An error occurred while calling z:...PythonSQLUtils.toPyRow.\n"
            ": java.lang.OutOfMemoryError: OutOfMemory"
        )))
    with pytest.raises(Py4JJavaError, match="assertion failed"):
        _obs_row(_Obs(_Err(
            "java.lang.AssertionError: assertion failed in ShuffleBlock"
        )))
    with pytest.raises(Py4JJavaError, match="OutOfMemory"):
        _obs_row(_Obs(_Err("java.lang.OutOfMemoryError: OutOfMemory")))
