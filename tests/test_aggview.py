"""IncrementalAggView — exact delta maintenance of a grouped aggregate from
the change data feed. Parity oracle: a from-scratch GROUP BY over the source
snapshot at every sync point (including NULL groups, group migrations,
metric changes, deletes, and group disappearance)."""

import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.aggview import IncrementalAggView
from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable


def delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, is_del boolean",
    )


def make_source(spark, path):
    t = SnapTable(spark, str(path))
    t.create(
        SEQUENCES_SCHEMA,
        key="doc_id",
        num_buckets=4,
        properties={"changelog": True},
    )
    return t


def scratch_agg(t):
    """The from-scratch answer the view must equal exactly."""
    rows = (
        t.read()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(F.col("n_tok").cast("long")), F.lit(0)).alias(
                "sum_n_tok"
            ),
        )
        .collect()
    )
    return sorted(
        ((r["source"], r["n_rows"], r["sum_n_tok"]) for r in rows),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def view_state(v):
    return sorted(
        (
            (r["source"], r["n_rows"], r["sum_n_tok"])
            for r in v.read().collect()
        ),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def test_view_tracks_source_exactly(spark, tmp_path):
    src = make_source(spark, tmp_path / "src")
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )

    # epoch 0: initial load, including a NULL-group doc
    src.merge(
        delta(
            spark,
            [(f"a{i}", [i], i + 1, "srcA", False) for i in range(5)]
            + [(f"b{i}", [i], 10, "srcB", False) for i in range(3)]
            + [("n0", [1], 7, None, False)],
        ),
        epoch=0,
        delete_col="is_del",
    )
    r = view.sync()
    assert r["initial_full"] is True
    assert view_state(view) == scratch_agg(src)

    # epoch 1: metric change, group migration (a0 moves srcA->srcB),
    # delete inside srcA, another NULL-group doc
    src.merge(
        delta(
            spark,
            [
                ("a1", [9], 99, "srcA", False),   # metric change
                ("a0", [1], 1, "srcB", False),    # group migration
                ("a2", None, None, None, True),   # delete
                ("n1", [2], 5, None, False),      # second NULL-group doc
            ],
        ),
        epoch=1,
        delete_col="is_del",
    )
    r = view.sync()
    assert r["initial_full"] is False
    assert view_state(view) == scratch_agg(src)

    # epoch 2: srcB disappears entirely
    src.merge(
        delta(
            spark,
            [("a0", None, None, None, True)]
            + [(f"b{i}", None, None, None, True) for i in range(3)],
        ),
        epoch=2,
        delete_col="is_del",
    )
    view.sync()
    state = view_state(view)
    assert state == scratch_agg(src)
    assert all(s != "srcB" for s, _n, _t in state)  # group removed, not 0-row


def test_view_sync_idempotent_and_skip(spark, tmp_path):
    src = make_source(spark, tmp_path / "src")
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    src.merge(
        delta(spark, [("a", [1], 3, "s1", False)]), epoch=0, delete_col="is_del"
    )
    r1 = view.sync()
    assert not r1["skipped"]
    r2 = view.sync()  # nothing new
    assert r2["skipped"]
    assert view_state(view) == scratch_agg(src)

    # several source commits between syncs: intermediate states cancel
    for e in range(1, 4):
        src.merge(
            delta(spark, [("a", [e], e * 10, "s1", False)]),
            epoch=e,
            delete_col="is_del",
        )
    view.sync()
    assert view_state(view) == [("s1", 1, 30)]


def test_view_rebuilds_when_incremental_inputs_gone(spark, tmp_path):
    """If GC expired the pre-image snapshot (or the feed window was trimmed)
    between syncs, sync() must fall back to an in-place full rebuild and
    still match the from-scratch answer — including deleting groups that
    vanished while the view was stale."""
    src = make_source(spark, tmp_path / "src")
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    src.merge(
        delta(
            spark,
            [("a", [1], 3, "s1", False), ("b", [2], 5, "s2", False)],
        ),
        epoch=0,
        delete_col="is_del",
    )
    view.sync()

    # churn + aggressive GC: the snapshot the view synced to is expired
    for e in range(1, 4):
        src.merge(
            delta(
                spark,
                [("a", [e], e, "s1", False)]
                + ([("b", None, None, None, True)] if e == 2 else []),
            ),
            epoch=e,
            delete_col="is_del",
        )
    src.expire_snapshots(keep_last=1)

    r = view.sync()
    assert r["full_rebuild"] is True and r["initial_full"] is False
    assert view_state(view) == scratch_agg(src)
    assert view_state(view) == [("s1", 1, 3)]  # s2 deleted during staleness


def test_view_null_merge_key_both_image_paths(spark, tmp_path):
    """NULL is a legal merge-key value; both image strategies (literal
    lookup and the dirty-bucket semi-join above MAX_LOOKUP_KEYS) must not
    drop its rows or the view silently diverges forever."""
    src = make_source(spark, tmp_path / "src")
    # rebuild_dirty_fraction > 1 pins the semi-join path: on this 4-bucket
    # fixture the 70-key churn dirties every bucket, which would otherwise
    # (correctly) route to the auto-rebuild and skip the code under test
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"], rebuild_dirty_fraction=1.1,
    )
    base = [(f"k{i}", [i], 1, "s1", False) for i in range(80)]
    src.merge(
        delta(spark, base + [(None, [0], 100, "s2", False)]),
        epoch=0,
        delete_col="is_del",
    )
    view.sync()
    assert view_state(view) == scratch_agg(src)

    # lookup path (2 changed keys, one NULL)
    src.merge(
        delta(spark, [(None, [0], 200, "s2", False), ("k0", [9], 9, "s1", False)]),
        epoch=1,
        delete_col="is_del",
    )
    r = view.sync()
    assert not r["full_rebuild"]
    assert view_state(view) == scratch_agg(src)
    assert ("s2", 1, 200) in view_state(view)

    # semi-join path (> MAX_LOOKUP_KEYS changed keys, one NULL)
    churn = [(f"k{i}", [i], 2, "s1", False) for i in range(70)]
    src.merge(
        delta(spark, churn + [(None, [0], 300, "s2", False)]),
        epoch=2,
        delete_col="is_del",
    )
    r = view.sync()
    assert not r["full_rebuild"]
    assert view_state(view) == scratch_agg(src)
    assert ("s2", 1, 300) in view_state(view)


def test_view_image_reads_push_key_filter(spark, tmp_path):
    """The incremental sync's pre/post-image reads must reach the source
    parquet scans as pushed key predicates (point reads), not table scans."""
    src = make_source(spark, tmp_path / "src")
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    src.merge(
        delta(spark, [(f"k{i}", [i], i, "s1", False) for i in range(50)]),
        epoch=0,
        delete_col="is_del",
    )
    view.sync()
    last = view.synced_version()
    src.merge(
        delta(spark, [("k3", [9], 9, "s2", False)]), epoch=1, delete_col="is_del"
    )
    d = view._incremental_delta("doc_id", last, src.manifest()["version"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
        if "doc_id" in seg.split("]")[0]
    ]
    # both image scans carry the changed-key predicate
    assert len(pushed) >= 2, plan


def test_view_multi_sync_randomized_parity(spark, tmp_path):
    """Deterministic pseudo-random churn across 5 sync points — the view
    must equal the from-scratch GROUP BY at every one."""
    import random

    rng = random.Random(13)
    src = make_source(spark, tmp_path / "src")
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    groups = ["g1", "g2", "g3", None]
    live = {}
    for epoch in range(5):
        rows = []
        for _ in range(30):
            k = f"d{rng.randrange(40)}"
            if rng.random() < 0.2 and k in live:
                rows.append((k, None, None, None, True))
                live.pop(k, None)
            else:
                g = rng.choice(groups)
                n = rng.randrange(1, 50)
                rows.append((k, [n], n, g, False))
                live[k] = (g, n)
        # one row per key per commit (merge contract)
        dedup = {}
        for row in rows:
            dedup[row[0]] = row
        src.merge(
            delta(spark, list(dedup.values())), epoch=epoch, delete_col="is_del"
        )
        view.sync()
        assert view_state(view) == scratch_agg(src), f"diverged at epoch {epoch}"


def test_view_double_metric_typed_sums(spark, tmp_path):
    """Fractional metrics must accumulate as DOUBLE, not truncate to long
    (r3 advice: _group_agg hardcoded a long cast). Scores are exact binary
    fractions so == parity with the from-scratch GROUP BY is exact."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = SnapTable(spark, str(tmp_path / "src"))
    src.create(
        schema, key="doc_id", num_buckets=4, properties={"changelog": True}
    )

    def d(rows):
        return spark.createDataFrame(
            rows, "doc_id string, score double, source string, is_del boolean"
        )

    src.merge(
        d([(f"k{i}", i + 0.25, "a" if i % 2 else "b", False) for i in range(8)]),
        epoch=0,
        delete_col="is_del",
    )
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["score"],
    )
    assert isinstance(
        dict(view.sum_types)["score"], T.DoubleType
    )
    view.sync()

    def scratch():
        rows = (
            src.read()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("score"), F.lit(0.0)).alias("sum_score"),
            )
            .collect()
        )
        return sorted((r["source"], r["n_rows"], r["sum_score"]) for r in rows)

    def state():
        return sorted(
            (r["source"], r["n_rows"], r["sum_score"])
            for r in view.read().collect()
        )

    assert state() == scratch()
    # incremental epoch: fractional change + delete
    src.merge(
        d([("k0", 10.5, "b", False), ("k1", None, None, True)]),
        epoch=1,
        delete_col="is_del",
    )
    view.sync()
    got = state()
    assert got == scratch()
    assert any(s % 1 != 0 for _g, _n, s in got)  # fractions survived


def test_view_rejects_unsupported_sum_type(spark, tmp_path):
    """Array / missing sum columns must fail at view CREATION, never
    truncate silently during maintenance."""
    src = make_source(spark, tmp_path / "src")
    with pytest.raises(ValueError, match="unsupported type"):
        IncrementalAggView(
            spark, src, str(tmp_path / "v1"), group_col="source",
            sum_cols=["tokens"],
        )
    with pytest.raises(ValueError, match="not in source schema"):
        IncrementalAggView(
            spark, src, str(tmp_path / "v2"), group_col="source",
            sum_cols=["nope"],
        )


def _keys_by_bucket(spark, n_candidates, num_buckets):
    """Replicate the writer's bucket function (pmod(xxhash64(key), n))."""
    df = spark.range(n_candidates).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.pmod(F.xxhash64(F.concat(F.lit("k"), F.col("id"))),
               F.lit(num_buckets)).alias("b"),
    )
    out = {}
    for r in df.collect():
        out.setdefault(r["b"], []).append(r["k"])
    return out


def test_view_wide_trickle_auto_rebuild_decision(spark, tmp_path):
    """>64 changed keys routes to the bucket-scan path; there, sync must
    rebuild when the dirty buckets hold most of the table's bytes and stay
    incremental when they don't (r3 verdict #3: the decision is automatic,
    from manifest metadata only). Pinned BOTH ways."""
    from pyspark.sql import types as T

    NB = 8
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = SnapTable(spark, str(tmp_path / "src"))
    src.create(
        schema, key="doc_id", num_buckets=NB, properties={"changelog": True}
    )

    def d(rows):
        return spark.createDataFrame(
            rows, "doc_id string, n_tok int, source string, is_del boolean"
        )

    by_bucket = _keys_by_bucket(spark, 4000, NB)
    all_keys = [k for ks in by_bucket.values() for k in ks]
    src.merge(
        d([(k, 3, "g", False) for k in all_keys]), epoch=0, delete_col="is_del"
    )
    view = IncrementalAggView(
        spark, src, str(tmp_path / "view"), group_col="source",
        sum_cols=["n_tok"],
    )
    view.sync()

    def state():
        return sorted(
            (r["source"], r["n_rows"], r["sum_n_tok"])
            for r in view.read().collect()
        )

    def scratch():
        rows = (
            src.read()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
            )
            .collect()
        )
        return sorted((r["source"], r["n_rows"], r["sum_n_tok"]) for r in rows)

    # narrow trickle: 80 keys (>64: bucket-scan path) all in ONE bucket of
    # 8 -> dirty fraction ~1/8 -> stays incremental
    one_bucket = by_bucket[0][:80]
    assert len(one_bucket) == 80
    src.merge(
        d([(k, 5, "g2", False) for k in one_bucket]),
        epoch=1,
        delete_col="is_del",
    )
    r = view.sync()
    assert r["full_rebuild"] is False and r["rebuild_reason"] is None
    assert state() == scratch()

    # wide trickle: 80 keys spread over ALL buckets -> dirty fraction ~1
    # -> automatic rebuild
    spread = [ks[-10] for ks in by_bucket.values() for _ in [0]]
    spread = [k for ks in by_bucket.values() for k in ks[-10:]]
    src.merge(
        d([(k, 7, "g3", False) for k in spread]), epoch=2, delete_col="is_del"
    )
    r = view.sync()
    assert r["full_rebuild"] is True and r["rebuild_reason"] == "dirty_fraction"
    assert state() == scratch()
