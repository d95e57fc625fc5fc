"""CdcPipeline.run_wap — the write-audit-publish replay mode: epochs
stage on a branch, the audit gates publication, main never sees an
unaudited epoch."""

import pytest

from embulk_filter_expand_json_spark.sources.changegen import (
    ChangeGenConfig,
    write_changes,
)
from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

CFG = ChangeGenConfig(n_events=2_000, n_docs=100, batch_size=500, seed=11)


@pytest.fixture(scope="module")
def changes_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wap_changes") / "log")
    write_changes(spark, CFG, path)
    return path


def state(t: SnapTable) -> list:
    return sorted((r["doc_id"], r["n_tok"]) for r in t.read().collect())


def test_wap_publish_equals_plain_run(spark, changes_path, tmp_path):
    plain = CdcPipeline(spark, changes_path, str(tmp_path / "plain"),
                        num_buckets=4)
    plain.run()

    audited = []
    wap = CdcPipeline(spark, changes_path, str(tmp_path / "wap"),
                      num_buckets=4, gc_keep_snapshots=2)
    r = wap.run_wap(lambda b: audited.append(b.read().count()) or True)
    assert r["published"] and r["epochs"]
    assert audited and audited[0] > 0
    assert state(wap.table) == state(plain.table)
    assert wap.last_committed_epoch() == plain.last_committed_epoch()
    assert wap.table.branches() == []  # published branch is cleaned up
    # inline GC deferred to main after publish
    assert len(wap.table._versions()) <= 2
    # a second WAP run with nothing new is a clean no-op
    r2 = wap.run_wap(lambda b: True)
    assert r2 == {"published": False, "epochs": [],
                  "reason": "no new epochs"}


def test_wap_audit_failure_leaves_main_untouched(spark, changes_path,
                                                 tmp_path):
    wap = CdcPipeline(spark, changes_path, str(tmp_path / "t"),
                      num_buckets=4)
    wap.run(max_epochs=1)
    before = state(wap.table)
    head = wap.table.manifest()["version"]

    r = wap.run_wap(lambda b: b.read().count() < 0)  # always fails
    assert not r["published"] and r["reason"] == "audit failed"
    assert r["epochs"]  # the epochs WERE staged
    assert state(wap.table) == before
    assert wap.table.manifest()["version"] == head
    assert wap.table.branches() == []
    # staged files are sweepable orphans now
    assert wap.table.remove_orphans(older_than_sec=0.0)["files_removed"] > 0

    # an audit that RAISES also drops the branch, then propagates
    with pytest.raises(RuntimeError, match="bad audit"):
        wap.run_wap(lambda b: (_ for _ in ()).throw(RuntimeError("bad audit")))
    assert wap.table.branches() == []
    assert state(wap.table) == before

    # after all that, a passing run publishes the same epochs exactly-once
    r = wap.run_wap(lambda b: True)
    assert r["published"]
    assert wap.last_committed_epoch() == max(wap.available_epochs())


def test_wap_recovers_leftover_branch(spark, changes_path, tmp_path):
    """A crashed prior WAP run leaves its branch behind; the next run
    drops it and re-stages from the head."""
    wap = CdcPipeline(spark, changes_path, str(tmp_path / "t"),
                      num_buckets=4)
    wap.run(max_epochs=1)
    stale = wap.table.create_branch("wap-audit")  # simulate the leftover
    stale_head = stale.manifest()["version"]

    r = wap.run_wap(lambda b: True)
    assert r["published"]
    assert wap.table.branches() == []
    assert wap.table.manifest()["version"] > stale_head
    assert wap.last_committed_epoch() == max(wap.available_epochs())


def test_canned_audits_gate_publication(spark, changes_path, tmp_path):
    from embulk_filter_expand_json_spark.streaming.audits import (
        AuditFailed,
        all_of,
        no_nulls,
        row_count_delta,
        unique_key,
    )

    pipe = CdcPipeline(spark, changes_path, str(tmp_path / "t"),
                       num_buckets=4)
    pipe.run(max_epochs=1)
    before = state(pipe.table)
    v_before = pipe.table.manifest()["version"]

    # a passing composite audit publishes the remaining epochs
    ok = all_of(
        unique_key(),
        no_nulls(["doc_id", "source"]),
        row_count_delta(pipe.table, max_growth_pct=500.0,
                        max_shrink_pct=90.0),
    )
    r = pipe.run_wap(ok)
    assert r["published"]

    # roll back, then an impossible growth bound blocks publication with
    # a specific reason and main stays byte-untouched
    pipe.table.restore(version=v_before)
    assert state(pipe.table) == before
    strict = row_count_delta(pipe.table, max_growth_pct=0.1)
    with pytest.raises(AuditFailed, match="grew"):
        pipe.run_wap(strict)
    assert state(pipe.table) == before
    assert pipe.table.branches() == []

    # no_nulls failure reads specifically too: the drift-evolved 'lang'
    # column is NULL on every pre-drift row by construction
    assert "lang" in pipe.table.schema().fieldNames()
    try:
        pipe.run_wap(all_of(unique_key(), no_nulls(["lang"])))
        raised = False
    except AuditFailed as e:
        raised = "NULLs" in str(e)
    assert raised
    assert state(pipe.table) == before  # still unpublished
