"""Replication / derived tables over the change data feed: bootstrap +
incremental catch-up, row-filter transforms with leave-the-set deletes,
resync after falling past the retention window, exactly-once re-runs."""

import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.replicate import replicate
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def make_source(spark, path, **props):
    t = SnapTable(spark, str(path))
    t.create(
        SEQUENCES_SCHEMA,
        key="doc_id",
        num_buckets=4,
        properties={"changelog": True, **props},
    )
    return t


def state(t, *cols):
    cols = cols or ("doc_id", "n_tok", "source")
    return sorted(tuple(r[c] for c in cols) for r in t.read().collect())


def test_bootstrap_then_incremental(spark, tmp_path):
    src = make_source(spark, tmp_path / "src")
    src.merge(
        delta(spark, [(f"k{i}", [i], i, "s", False) for i in range(6)]),
        epoch=0,
        delete_col="is_del",
    )
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "bootstrap"
    dst = SnapTable(spark, str(tmp_path / "dst"))
    assert state(dst) == state(src)

    # two more source commits, then ONE catch-up round applies both
    src.merge(
        delta(spark, [("k0", [9], 99, "s", False), ("k1", None, None, None, True)]),
        epoch=1,
        delete_col="is_del",
    )
    src.merge(
        delta(spark, [("k7", [7], 7, "s2", False)]), epoch=2, delete_col="is_del"
    )
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "incremental" and len(r["applied_versions"]) == 2
    assert state(dst) == state(src)

    # idempotent
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "up_to_date"
    assert state(dst) == state(src)


def test_derived_table_filter_and_projection(spark, tmp_path):
    """Filter transform: rows that UPDATE OUT of the predicate set must be
    deleted downstream, not silently left stale."""
    src = make_source(spark, tmp_path / "src")

    def only_big(df):
        return df.filter(F.col("n_tok") >= 10).select(
            "doc_id", "n_tok", (F.col("n_tok") * 2).alias("double_tok")
        )

    src.merge(
        delta(
            spark,
            [("a", [1], 20, "s", False), ("b", [2], 5, "s", False)],
        ),
        epoch=0,
        delete_col="is_del",
    )
    replicate(spark, src, str(tmp_path / "dst"), transform=only_big)
    dst = SnapTable(spark, str(tmp_path / "dst"))
    assert state(dst, "doc_id", "n_tok", "double_tok") == [("a", 20, 40)]

    # 'a' updates OUT of the set; 'b' updates INTO it; 'c' arrives inside
    src.merge(
        delta(
            spark,
            [
                ("a", [1], 3, "s", False),
                ("b", [2], 15, "s", False),
                ("c", [3], 30, "s", False),
            ],
        ),
        epoch=1,
        delete_col="is_del",
    )
    r = replicate(spark, src, str(tmp_path / "dst"), transform=only_big)
    assert r["mode"] == "incremental"
    assert state(dst, "doc_id", "n_tok", "double_tok") == [
        ("b", 15, 30),
        ("c", 30, 60),
    ]

    # source delete propagates through the transform path too
    src.merge(
        delta(spark, [("c", None, None, None, True)]), epoch=2, delete_col="is_del"
    )
    replicate(spark, src, str(tmp_path / "dst"), transform=only_big)
    assert state(dst, "doc_id", "n_tok", "double_tok") == [("b", 15, 30)]


def test_resync_after_retention_gap(spark, tmp_path):
    """A replica that fell past changelog_keep must full-resync: pick up
    everything new AND delete rows that vanished while it was stale."""
    src = make_source(spark, tmp_path / "src", changelog_keep=2)
    src.merge(
        delta(spark, [("a", [1], 1, "s", False), ("b", [2], 2, "s", False)]),
        epoch=0,
        delete_col="is_del",
    )
    replicate(spark, src, str(tmp_path / "dst"))

    # 4 commits while the replica sleeps -> window (keep=2) trimmed
    for e in range(1, 5):
        src.merge(
            delta(
                spark,
                [("c", [e], e, "s", False)]
                + ([("a", None, None, None, True)] if e == 3 else []),
            ),
            epoch=e,
            delete_col="is_del",
        )
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "resync_after_gap"
    dst = SnapTable(spark, str(tmp_path / "dst"))
    assert state(dst) == state(src)
    assert ("a", 1, "s") not in state(dst)  # deleted during staleness


def test_resync_keeps_null_key_row(spark, tmp_path):
    """NULL is one logical key engine-wide: a full resync whose snapshot
    still contains the NULL-key row must NOT emit a spurious delete for it
    (a null-rejecting anti-join would never match NULL against NULL and
    delete-wins tie-break would drop the row)."""
    src = make_source(spark, tmp_path / "src", changelog_keep=2)
    src.merge(
        delta(
            spark,
            [(None, [0], 10, "s", False), ("b", [2], 2, "s", False)],
        ),
        epoch=0,
        delete_col="is_del",
    )
    replicate(spark, src, str(tmp_path / "dst"))

    # push past the retention window; NULL-key row untouched throughout
    for e in range(1, 5):
        src.merge(
            delta(spark, [("c", [e], e, "s", False)]),
            epoch=e,
            delete_col="is_del",
        )
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "resync_after_gap"
    dst = SnapTable(spark, str(tmp_path / "dst"))

    def rows(t):  # set compare: tuples with None don't sort
        return {
            (r["doc_id"], r["n_tok"], r["source"])
            for r in t.read().collect()
        }

    assert rows(dst) == rows(src)
    assert (None, 10, "s") in rows(dst)  # survived the resync


def test_incremental_survives_gc_of_intermediate_snapshots(spark, tmp_path):
    """Only the LATEST source manifest is guaranteed retained; catch-up
    must resolve the whole feed window from it rather than reading the
    expired per-commit manifests (which expire_snapshots unlinks)."""
    src = make_source(spark, tmp_path / "src")
    src.merge(
        delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del"
    )
    replicate(spark, src, str(tmp_path / "dst"))
    for e in range(1, 4):
        src.merge(
            delta(spark, [(f"k{e}", [e], e, "s", False)]),
            epoch=e,
            delete_col="is_del",
        )
    src.expire_snapshots(keep_last=1)  # intermediate manifests gone
    r = replicate(spark, src, str(tmp_path / "dst"))
    assert r["mode"] == "incremental" and len(r["applied_versions"]) == 3
    dst = SnapTable(spark, str(tmp_path / "dst"))
    assert state(dst) == state(src)


def test_coalesced_equals_per_commit_catchup(spark, tmp_path):
    """Coalesced window catch-up (one merge, per-key LWW by commit
    version) must reach exactly the per-commit replay's state — including
    a key that is upserted then deleted, and one deleted then re-upserted,
    across the pending window; with a filter transform on top."""
    src = make_source(spark, tmp_path / "src")
    src.merge(
        delta(spark, [("a", [1], 50, "s", False), ("b", [2], 40, "s", False)]),
        epoch=0,
        delete_col="is_del",
    )
    f = lambda df: df.filter(F.col("n_tok") >= 10)  # noqa: E731
    for mode in ("co", "pc"):
        replicate(
            spark, src, str(tmp_path / mode), transform=f,
            coalesce_window=(mode == "co"),
        )
    src.merge(
        delta(spark, [("a", None, None, None, True), ("c", [3], 30, "s", False)]),
        epoch=1,
        delete_col="is_del",
    )
    src.merge(
        delta(spark, [("a", [9], 90, "s", False), ("c", None, None, None, True),
                      ("b", [2], 5, "s", False)]),
        epoch=2,
        delete_col="is_del",
    )
    r_co = replicate(
        spark, src, str(tmp_path / "co"), transform=f, coalesce_window=True
    )
    r_pc = replicate(
        spark, src, str(tmp_path / "pc"), transform=f, coalesce_window=False
    )
    assert r_co["mode"] == r_pc["mode"] == "incremental"
    assert r_co["applied_versions"] == r_pc["applied_versions"]
    co = SnapTable(spark, str(tmp_path / "co"))
    pc = SnapTable(spark, str(tmp_path / "pc"))
    assert state(co, "doc_id", "n_tok") == state(pc, "doc_id", "n_tok")
    # a: deleted then re-upserted -> present; b: updated out of filter ->
    # gone; c: upserted then deleted -> gone
    assert state(co, "doc_id", "n_tok") == [("a", 90)]
    # and the coalesced replica paid ONE merge for the two pending commits
    assert co.manifest()["version"] < pc.manifest()["version"]


def test_schema_evolution_propagates(spark, tmp_path):
    from pyspark.sql import types as T

    src = make_source(spark, tmp_path / "src")
    src.merge(
        delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del"
    )
    replicate(spark, src, str(tmp_path / "dst"))
    src.evolve_add_columns([T.StructField("lang", T.StringType(), True)])
    src.merge(
        delta(spark, [("b", [2], 2, "s", False)]).withColumn(
            "lang", F.lit("en")
        ),
        epoch=1,
        delete_col="is_del",
    )
    replicate(spark, src, str(tmp_path / "dst"))
    dst = SnapTable(spark, str(tmp_path / "dst"))
    assert "lang" in dst.schema().fieldNames()
    got = sorted((r["doc_id"], r["lang"]) for r in dst.read().collect())
    assert got == [("a", None), ("b", "en")]


def test_null_key_row_replicates(spark, tmp_path):
    """NULL is one logical merge key engine-wide: a kept NULL-key upsert
    must replicate (not be flagged as filter-dropped and deleted)."""
    src = make_source(spark, tmp_path / "src")
    src.merge(
        delta(spark, [("a", [1], 50, "s", False)]), epoch=0, delete_col="is_del"
    )
    replicate(
        spark,
        src,
        str(tmp_path / "dst"),
        transform=lambda df: df.filter(F.col("n_tok") >= 10),
    )
    src.merge(
        delta(spark, [(None, [2], 60, "s", False), ("b", [3], 5, "s", False)]),
        epoch=1,
        delete_col="is_del",
    )
    replicate(
        spark,
        src,
        str(tmp_path / "dst"),
        transform=lambda df: df.filter(F.col("n_tok") >= 10),
    )
    dst = SnapTable(spark, str(tmp_path / "dst"))
    got = sorted(
        ((r["doc_id"], r["n_tok"]) for r in dst.read().collect()),
        key=lambda t: (t[0] is None, t[0] or ""),
    )
    assert got == [("a", 50), (None, 60)]


def test_changelog_disabled_raises(spark, tmp_path):
    src = SnapTable(spark, str(tmp_path / "src"))
    src.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2)
    src.merge(
        delta(spark, [("a", [1], 1, "s", False)]), epoch=0, delete_col="is_del"
    )
    replicate(spark, src, str(tmp_path / "dst"))  # bootstrap needs no feed
    src.merge(
        delta(spark, [("b", [2], 2, "s", False)]), epoch=1, delete_col="is_del"
    )
    with pytest.raises(ValueError, match="not enabled"):
        replicate(spark, src, str(tmp_path / "dst"))
