"""TableFS layer (fs.py): contract tests for LocalFS and ArrowFS, plus a
full SnapTable lifecycle driven through the OBJECT-STORE code path
(ArrowFS over pyarrow's LocalFileSystem — same code that runs against
S3/GCS/HDFS, minus the network) asserting parity with the POSIX path.

The in-memory ``pyarrow.fs._MockFileSystem`` additionally exercises the
metadata protocol on a store with NO real directories — the closest
in-sandbox stand-in for S3 semantics."""

import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_expand_json_spark.streaming.fs import (
    ArrowFS,
    LocalFS,
    PublishConflict,
    fs_for_path,
)
from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import (
    CommitConflict,
    SnapTable,
)


def local_arrow_fs():
    from pyarrow.fs import LocalFileSystem

    return ArrowFS(LocalFileSystem())


def mock_arrow_fs():
    from pyarrow.fs import _MockFileSystem

    return ArrowFS(_MockFileSystem())


# --------------------------------------------------------------- contract
def _seed(fs, root):
    fs.publish_atomic("one", f"{root}/a/x.txt")
    fs.publish_atomic("22", f"{root}/a/b/y.txt")
    fs.publish_atomic("333", f"{root}/z.txt")


@pytest.mark.parametrize(
    "mk",
    [LocalFS, local_arrow_fs, mock_arrow_fs],
    ids=["local", "arrow-local", "arrow-mock"],
)
def test_fs_contract(mk, tmp_path):
    fs = mk()
    # mock fs is rooted at its own namespace; local impls use tmp_path
    root = "t" if mk is mock_arrow_fs else str(tmp_path / "t")
    _seed(fs, root)

    assert fs.read_text(f"{root}/a/x.txt") == "one"
    assert fs.isfile(f"{root}/z.txt")
    assert not fs.isfile(f"{root}/a")
    assert fs.size(f"{root}/a/b/y.txt") == 2

    assert fs.list_names(f"{root}/a") == ["b", "x.txt"]
    assert fs.list_names(f"{root}/missing") == []
    assert fs.list_files_recursive(f"{root}/a") == [
        ("b/y.txt", 2),
        ("x.txt", 3),
    ]
    assert fs.list_files_recursive(f"{root}/missing") == []
    walked = dict(fs.walk_stats(root))
    assert set(walked) == {"a/x.txt", "a/b/y.txt", "z.txt"}

    # the commit primitive refuses to overwrite, loudly
    with pytest.raises(PublishConflict):
        fs.publish_atomic("clobber", f"{root}/z.txt")
    assert fs.read_text(f"{root}/z.txt") == "333"

    fs.append_text(f"{root}/log/l.txt", "a\n")
    fs.append_text(f"{root}/log/l.txt", "b\n")
    assert fs.read_text(f"{root}/log/l.txt") == "a\nb\n"

    fs.delete(f"{root}/a/b/y.txt")
    assert not fs.isfile(f"{root}/a/b/y.txt")
    fs.delete(f"{root}/a/b/y.txt")  # missing_ok default
    with pytest.raises(Exception):
        fs.delete(f"{root}/a/b/y.txt", missing_ok=False)


def test_fs_for_path_dispatch(tmp_path):
    fs, p = fs_for_path(str(tmp_path))
    assert isinstance(fs, LocalFS) and p == str(tmp_path)
    fs, p = fs_for_path(f"file://{tmp_path}")
    assert isinstance(fs, LocalFS) and p == str(tmp_path)


def test_local_publish_leaves_no_tmp(tmp_path):
    fs = LocalFS()
    fs.publish_atomic("x", str(tmp_path / "v1.json"))
    with pytest.raises(PublishConflict):
        fs.publish_atomic("y", str(tmp_path / "v1.json"))
    assert sorted(os.listdir(tmp_path)) == ["v1.json"]


# ------------------------------------------------- SnapTable on ArrowFS
def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "is_del boolean",
    )


def make_pair(spark, tmp_path):
    """Same table driven twice: POSIX LocalFS vs the object-store code
    path (ArrowFS). Both over local disk so Spark's data I/O is common."""
    tables = []
    for name, fs in (("posix", None), ("arrow", local_arrow_fs())):
        t = SnapTable(spark, str(tmp_path / name), fs=fs)
        t.create(
            SEQUENCES_SCHEMA,
            key="doc_id",
            num_buckets=4,
            properties={"changelog": True},
        )
        tables.append(t)
    return tables


def rows_key(df):
    return sorted(map(repr, df.collect()))


def test_snaptable_lifecycle_parity_on_arrowfs(spark, tmp_path):
    posix_t, arrow_t = make_pair(spark, tmp_path)
    epochs = [
        [("a", [1], 1, "s", False), ("b", [2], 2, "s", False)],
        [("a", [9], 9, "s", False), ("c", [3], 3, "s", False)],
        [("b", None, 0, "s", True)],
    ]
    for t in (posix_t, arrow_t):
        for e, rows in enumerate(epochs):
            r = t.merge(delta(spark, rows), epoch=e, delete_col="is_del")
            assert not r.get("skipped")
        # idempotent re-apply stays a no-op through ArrowFS too
        assert t.merge(
            delta(spark, epochs[-1]), epoch=len(epochs) - 1,
            delete_col="is_del",
        )["skipped"]

    assert rows_key(posix_t.read()) == rows_key(arrow_t.read())
    assert rows_key(posix_t.read_changes(0)) == rows_key(
        arrow_t.read_changes(0)
    )
    assert (
        posix_t.manifest()["last_committed_epoch"]
        == arrow_t.manifest()["last_committed_epoch"]
        == 2
    )

    # maintenance through the object-store path — tag an early version so
    # expire has to honor the ref-retention rule via ArrowFS primitives too
    pinned = arrow_t._versions()[1]
    arrow_t.create_tag("pin", version=pinned)
    c = arrow_t.compact()
    assert c["compacted"]
    assert rows_key(arrow_t.read()) == rows_key(posix_t.read())
    ex = arrow_t.expire_snapshots(keep_last=2)
    assert ex["expired_versions"]
    assert pinned in arrow_t._versions()
    assert arrow_t.read(tag="pin").count() == 2
    arrow_t.drop_tag("pin")
    assert rows_key(arrow_t.read()) == rows_key(posix_t.read())
    arrow_t.remove_orphans(older_than_sec=0.0)
    assert rows_key(arrow_t.read()) == rows_key(posix_t.read())

    # evolution: manifest-only bump through ArrowFS
    assert arrow_t.evolve_add_columns(
        [T.StructField("lang", T.StringType(), True)]
    )
    assert "lang" in arrow_t.read().columns


def test_commit_conflict_through_arrowfs(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"), fs=local_arrow_fs())
    t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    man = t.manifest()
    man["version"] += 1
    t._publish(dict(man))
    with pytest.raises(CommitConflict):
        t._publish(dict(man))


def test_arrowfs_readback_detects_lost_race(tmp_path):
    """Simulate the PUT race the read-back protocol exists for: another
    writer's object lands between this writer's existence check and its
    verification read. Token mismatch must raise, not proceed."""

    class RacingFS(ArrowFS):
        def __init__(self, fs, steal):
            super().__init__(fs)
            self._steal = steal
            self._stole = False

        def read_text(self, path):
            if not self._stole:
                self._stole = True
                # the rival's PUT wins the race just before our read-back
                with self.fs.open_output_stream(path) as f:
                    f.write(self._steal.encode())
            return super().read_text(path)

    from pyarrow.fs import LocalFileSystem

    fs = RacingFS(LocalFileSystem(), steal=json.dumps({"commit_uuid": "rival"}))
    with pytest.raises(PublishConflict, match="lost commit race"):
        fs.publish_atomic(
            json.dumps({"commit_uuid": "me"}), str(tmp_path / "v2.json")
        )


def test_feed_source_reads_through_tablefs(spark, tmp_path):
    """The streaming source's manifest resolution goes through the same
    TableFS dispatch — a file:// URI path works end-to-end."""
    from embulk_filter_expand_json_spark.streaming.feed_source import (
        _latest_manifest,
    )

    t = SnapTable(spark, str(tmp_path / "t"))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"changelog": True},
    )
    t.merge(delta(spark, [("a", [1], 1, "s", False)]), epoch=0,
            delete_col="is_del")
    man_plain = _latest_manifest(str(tmp_path / "t"))
    man_uri = _latest_manifest(f"file://{tmp_path}/t")
    assert man_plain["version"] == man_uri["version"]
    assert man_plain["changes"] == man_uri["changes"]
