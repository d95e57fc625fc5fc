"""jobs/maintain.py — the maintenance CLI verbs, driven through run()
with the test session (spark-submit wraps the same function)."""

import io
import json
import sys
from contextlib import redirect_stdout

import pytest

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

from tests.test_concurrency import delta

sys.path.insert(0, "jobs")
import maintain  # noqa: E402


def _run(spark, *argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = maintain.run(spark, list(argv))
    assert rc == 0
    return [json.loads(line) for line in buf.getvalue().splitlines()]


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapTable(spark, path)
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
             properties={"stats_columns": ["n_tok"]})
    t.merge(
        delta(spark, [(f"k{i}", [i], i, "s", False) for i in range(20)]),
        epoch=0, delete_col="is_del",
    )
    return t, path


def test_describe_history_files(spark, table):
    t, path = table
    (d,) = _run(spark, "describe", "--table", path)
    assert d["num_buckets"] == 2 and d["base_rows_recorded"] == 20
    hist = _run(spark, "history", "--table", path)
    assert [h["summary"]["op"] for h in hist] == ["create", "merge"]
    files = _run(spark, "files", "--table", path)
    assert len(files) == len(t.manifest()["files"])


def test_compact_zorder_and_restore(spark, table):
    t, path = table
    v0 = t.manifest()["version"]
    (c,) = _run(spark, "compact", "--table", path, "--target-files", "4",
                "--cluster-by", "n_tok,source")
    assert c["compacted"]
    (r,) = _run(spark, "restore", "--table", path, "--version", str(v0))
    assert r["restored_to"] == v0


def test_dml_verbs(spark, table):
    t, path = table
    (u,) = _run(spark, "update-where", "--table", path,
                "--where", "n_tok < 5",
                "--set", "source=concat('q-', source),n_tok=n_tok + 100")
    assert not u["skipped"]
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["k3"]["source"] == "q-s" and rows["k3"]["n_tok"] == 103
    (d,) = _run(spark, "delete-where", "--table", path,
                "--where", "source = 'q-s'")
    assert not d["skipped"]
    assert t.read().count() == 15


def test_expire_and_vacuum(spark, table):
    t, path = table
    t.compact()
    # everything is seconds old: a 1-hour age gate expires nothing even
    # with keep-last 1 ...
    (e,) = _run(spark, "expire", "--table", path, "--keep-last", "1",
                "--max-age-sec", "3600")
    assert e["expired_versions"] == []
    # ... and a zero age gate behaves like plain keep-last
    (e,) = _run(spark, "expire", "--table", path, "--keep-last", "1",
                "--max-age-sec", "0")
    assert e["expired_versions"]
    (v,) = _run(spark, "vacuum", "--table", path, "--older-than-sec", "0")
    assert "files_removed" in v


def test_tag_verbs(spark, table):
    t, path = table
    v = t.manifest()["version"]
    (ref,) = _run(spark, "tag", "--table", path, "--name", "rel-1")
    assert ref["version"] == v
    (listing,) = _run(spark, "tags", "--table", path)
    assert listing == {"rel-1": v}
    (d,) = _run(spark, "drop-tag", "--table", path, "--name", "rel-1")
    assert d == {"dropped": "rel-1"}
    (listing,) = _run(spark, "tags", "--table", path)
    assert listing == {}


def test_parse_set_respects_nesting():
    out = maintain._parse_set("a=concat(x, ','),b=f(g(1,2),3)")
    assert out == {"a": "concat(x, ',')", "b": "f(g(1,2),3)"}


def test_branch_verbs(spark, table):
    t, path = table
    (c,) = _run(spark, "create-branch", "--table", path, "--name", "audit")
    assert c == {"created": "audit"}
    (ls,) = _run(spark, "branches", "--table", path)
    assert ls == ["audit"]
    # nothing staged on the branch yet: fast-forward is an empty publish
    (ff,) = _run(spark, "fast-forward", "--table", path, "--name", "audit")
    assert ff["published_versions"] == []
    (d,) = _run(spark, "drop-branch", "--table", path, "--name", "audit")
    assert d == {"dropped": "audit"}
    (ls,) = _run(spark, "branches", "--table", path)
    assert ls == []
