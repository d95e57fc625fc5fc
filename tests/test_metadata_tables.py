"""Metadata/observability surface: files_df() (Iceberg .files analog),
describe_detail() (Delta DESCRIBE DETAIL analog), and the per-file row
counts recorded alongside column stats. All metadata-only — no data
file is scanned."""

import json

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

from tests.test_concurrency import delta


def _row(doc_id, tok, n_tok=1, is_del=False):
    return (doc_id, [tok], n_tok, "s", is_del)


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"changelog": True, "stats_columns": ["n_tok"],
                    "min_mor_base_bytes": 0, "mor_rewrite_ratio": 1e9,
                    "max_delta_files_per_bucket": 100},
    )
    t.merge(
        delta(spark, [_row(f"k{i}", i, n_tok=i) for i in range(40)]),
        epoch=0, delete_col="is_del",
    )
    # a small second epoch defers as MoR deltas (floor disabled above)
    t.merge(delta(spark, [_row("k1", 99, n_tok=99)]), epoch=1,
            delete_col="is_del")
    return t


def test_files_df_inventory(spark, table):
    t = table
    rows = table.files_df().collect()
    man = t.manifest()
    assert len(rows) == len(man["files"])
    kinds = {r["kind"] for r in rows}
    assert kinds == {"base", "delta"}
    base = [r for r in rows if r["kind"] == "base"]
    # footer row counts recorded (stats_columns opens the footer anyway)
    assert all(r["rows"] is not None and r["rows"] > 0 for r in base)
    assert sum(r["rows"] for r in base) == 40
    # stats ride as JSON
    st = json.loads(next(r["stats"] for r in base if r["stats"]))
    assert "n_tok" in st
    # delta entries carry seq + delete flag
    d = [r for r in rows if r["kind"] == "delta"]
    assert all(r["seq"] is not None and r["is_delete"] is not None
               for r in d)
    # bytes always present
    assert all(r["bytes"] > 0 for r in rows)


def test_files_df_time_travel(spark, table):
    t = table
    v1_files = t.files_df(version=2).count()  # after epoch 0 only
    assert v1_files < t.files_df().count()


def test_describe_detail(spark, table):
    t = table
    d = t.describe_detail()
    assert d["version"] == t.manifest()["version"]
    assert d["key"] == "doc_id" and d["num_buckets"] == 2
    assert d["last_committed_epoch"] == 1
    assert d["num_base_files"] >= 1 and d["num_delta_files"] >= 1
    assert d["base_rows_recorded"] == 40
    assert d["base_bytes"] > 0 and d["delta_bytes"] > 0
    assert "doc_id" in d["columns"]
    assert d["changelog_entries"] == 2
    assert d["properties"]["stats_columns"] == ["n_tok"]
    assert d["tags"] == {}
    t.create_tag("rel", version=d["version"])
    assert t.describe_detail()["tags"] == {"rel": d["version"]}


def test_rows_absent_without_stats_columns(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "nostats"))
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    t.merge(delta(spark, [_row("a", 1)]), epoch=0, delete_col="is_del")
    rows = t.files_df().collect()
    assert all(r["rows"] is None for r in rows)  # no footer was opened
    assert t.describe_detail()["base_rows_recorded"] is None
