"""SCD Type-2 history replica (streaming/scd.py) over the change feed.

The strong invariant: for EVERY source epoch e, ``as_of_epoch(e)`` must
equal the source table's own time travel to the version that committed
e — the history table is a lossless re-encoding of the feed. Plus:
incremental applies (two applies == one), exactly-once re-apply,
delete handling (interval closes, none opens), additive evolution
flow-through, and the loud past-retention failure.
"""

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.scd import Scd2Replica
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

from tests.test_concurrency import delta


def _row(doc_id, tok, n_tok=1, source="s", is_del=False):
    return (doc_id, [tok], n_tok, source, is_del)


EPOCH_ROWS = {
    0: [_row("a", 1, 10), _row("b", 1, 20), _row("c", 1, 30)],
    1: [_row("a", 2, 11), _row("d", 1, 40)],           # update a, insert d
    2: [_row("b", 0, 0, is_del=True)],                  # delete b
    3: [_row("a", 3, 12), _row("b", 9, 99)],            # update a, revive b
}


@pytest.fixture()
def source(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "src"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
             properties={"changelog": True})
    versions = {}
    for e, rows in EPOCH_ROWS.items():
        r = t.merge(delta(spark, rows), epoch=e, delete_col="is_del")
        versions[e] = r["version"]
    return t, versions


def _hist(scd):
    return sorted(
        (r["doc_id"], r["valid_from_epoch"], r["valid_to_epoch"],
         r["_scd_open"], r["n_tok"])
        for r in scd.history().collect()
    )


def test_full_history_intervals(spark, source, tmp_path):
    t, _ = source
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    scd.apply()
    assert _hist(scd) == sorted([
        ("a", 0, 1, False, 10), ("a", 1, 3, False, 11),
        ("a", 3, None, True, 12),
        ("b", 0, 2, False, 20), ("b", 3, None, True, 99),
        ("c", 0, None, True, 30),
        ("d", 1, None, True, 40),
    ])


def test_incremental_equals_one_shot(spark, source, tmp_path):
    t, versions = source
    one = Scd2Replica(spark, t, str(tmp_path / "one"))
    one.apply()
    inc = Scd2Replica(spark, t, str(tmp_path / "inc"))
    inc.apply(to_version=versions[1])   # first two epochs
    inc.apply()                          # the rest
    assert _hist(inc) == _hist(one)
    # exactly-once: a third catch-up with nothing new is a no-op
    assert inc.apply()["skipped"] is True


def test_as_of_epoch_matches_source_time_travel(spark, source, tmp_path):
    t, versions = source
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    scd.apply()
    for e, v in versions.items():
        got = sorted(
            (r["doc_id"], r["n_tok"])
            for r in scd.as_of_epoch(e).collect()
        )
        want = sorted(
            (r["doc_id"], r["n_tok"])
            for r in t.read(version=v).collect()
        )
        assert got == want, f"epoch {e}"


def test_evolution_flows_through(spark, source, tmp_path):
    t, _ = source
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    scd.apply()
    from pyspark.sql import types as T
    t.evolve_add_columns([T.StructField("lang", T.StringType(), True)])
    t.merge(
        spark.createDataFrame(
            [("a", [4], 13, "s", "en", False)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "lang string, is_del boolean",
        ),
        epoch=4, delete_col="is_del",
    )
    scd.apply()
    rows = {(r["doc_id"], r["valid_from_epoch"]): r
            for r in scd.history().collect()}
    assert rows[("a", 4)]["lang"] == "en" and rows[("a", 4)]["_scd_open"]
    assert rows[("a", 3)]["valid_to_epoch"] == 4
    assert rows[("a", 0)]["lang"] is None  # pre-evolution intervals null-fill


def test_past_retention_fails_loudly(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "src"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
             properties={"changelog": True, "changelog_keep": 1})
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    t.merge(delta(spark, [_row("a", 1)]), epoch=0, delete_col="is_del")
    scd.apply()
    t.merge(delta(spark, [_row("b", 1)]), epoch=1, delete_col="is_del")
    t.merge(delta(spark, [_row("c", 1)]), epoch=2, delete_col="is_del")
    with pytest.raises(ValueError, match="incomplete"):
        scd.apply()  # slept past changelog_keep=1


def test_open_rows_read_is_file_pruned(spark, source, tmp_path):
    """The steady-state cost guard: once most intervals are closed and
    compaction has clustered by _scd_open, the open-rows read skips the
    closed tail's files."""
    t, _ = source
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    scd.apply()
    scd.table.compact(target_files_per_bucket=4, cluster_by="_scd_open")
    pv = scd.table.prune_preview("_scd_open", True, True)
    assert pv["base_files_read"] < pv["base_files"], pv


def test_version_clock_under_dml(spark, source, tmp_path):
    """Interactive DML reuses the pinned watermark epoch, so the epoch
    interval can be zero-width — the version clock must still totally
    order the history and as_of_version must see every state."""
    t, versions = source
    t.update_where("doc_id = 'a'", {"n_tok": "n_tok + 1000"})  # same epoch 3
    v_dml = t.manifest()["version"]
    scd = Scd2Replica(spark, t, str(tmp_path / "scd"))
    scd.apply()
    a_rows = sorted(
        (r["valid_from_version"], r["valid_to_version"], r["n_tok"],
         r["valid_from_epoch"], r["valid_to_epoch"])
        for r in scd.history().filter("doc_id = 'a'").collect()
    )
    # four intervals, version-contiguous, last one open with the DML value
    assert [r[2] for r in a_rows] == [10, 11, 12, 1012]
    assert a_rows[-1][0] == v_dml and a_rows[-1][1] is None
    assert all(a_rows[i][1] == a_rows[i + 1][0] for i in range(3))
    # the epoch clock IS ambiguous here: the interval the DML closed is
    # zero-width in epochs (DML reuses the pinned watermark epoch)
    assert a_rows[2][3] == a_rows[2][4] == 3
    # version point-in-time sees the pre-DML value; epoch clock cannot
    got = scd.as_of_version(v_dml - 1).filter("doc_id = 'a'").collect()
    assert [r["n_tok"] for r in got] == [12]
    got2 = scd.as_of_version(v_dml).filter("doc_id = 'a'").collect()
    assert [r["n_tok"] for r in got2] == [1012]
