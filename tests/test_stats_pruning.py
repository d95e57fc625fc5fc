"""Column-stats file skipping (SnapTable property ``stats_columns`` +
read_where) — the Iceberg data-skipping analog on a non-key column,
layered under bucket pruning.

The hard contract: read_where == read().filter() ALWAYS (pruning can only
change which files are read), including under outstanding MoR deltas whose
updates move values across the range boundary; and the pruning actually
skips files when value ranges are file-localized.
"""

import random

import pytest
from pyspark.sql import functions as F, types as T

from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def rows_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, n_tok int, source string")


def _mk(spark, path, **props):
    t = SnapTable(spark, str(path))
    t.create(
        SCHEMA,
        key="doc_id",
        num_buckets=4,
        properties={"stats_columns": ["n_tok"], **props},
    )
    return t


def _state(df):
    return sorted(map(tuple, df.collect()))


def test_stats_recorded_and_pruning_skips_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # correlate value ranges with the key's hash bucket so each base file
    # (one per bucket on first load) carries a disjoint n_tok range — the
    # deployment shape where stats pruning pays: values clustered by file
    ids = [f"d{i}" for i in range(160)]
    buckets = {
        r["doc_id"]: r["b"]
        for r in spark.createDataFrame([(i,) for i in ids], "doc_id string")
        .select("doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("b"))
        .collect()
    }
    seen: dict = {}
    rows = []
    for d in ids:
        b = buckets[d]
        rows.append((d, int(b) * 1000 + seen.get(b, 0), "s"))
        seen[b] = seen.get(b, 0) + 1
    t.merge(rows_df(spark, rows), epoch=0)

    man = t.manifest()
    base_files = [f for f in man["files"] if f.get("kind", "base") == "base"]
    assert all("stats" in f for f in base_files)
    for f in base_files:
        mn, mx, has_null = f["stats"]["n_tok"]
        assert mn <= mx and has_null is False

    pv = t.prune_preview("n_tok", 2000, 2999)
    assert pv["base_files"] == 4 and pv["base_files_read"] == 1
    got = _state(t.read_where("n_tok", 2000, 2999))
    want = _state(t.read().filter("n_tok between 2000 and 2999"))
    assert got == want and len(got) == sum(
        1 for _, v, _ in rows if 2000 <= v <= 2999
    ) > 0


def test_read_where_equals_filter_under_mor_deltas(spark, tmp_path):
    """Randomized equality: updates move values across the boundary while
    the delta stack is outstanding (huge mor_rewrite_ratio defers)."""
    t = _mk(
        spark,
        tmp_path / "m",
        min_mor_base_bytes=0,
        mor_rewrite_ratio=1e9,
        max_delta_files_per_bucket=100,
    )
    rng = random.Random(17)
    state = {}
    epoch = 0
    t.merge(
        rows_df(
            spark, [(f"d{i}", rng.randrange(0, 100), "s") for i in range(60)]
        ),
        epoch=epoch,
    )
    for epoch in range(1, 4):
        upd = [
            (f"d{rng.randrange(60)}", rng.randrange(0, 100), "u")
            for _ in range(15)
        ]
        dedup = {k: (k, v, s) for k, v, s in upd}
        t.merge(rows_df(spark, list(dedup.values())), epoch=epoch)
    assert any(f.get("kind") == "delta" for f in t.manifest()["files"])
    for lo, hi in ((0, 10), (25, 75), (90, 99), (None, 50), (50, None)):
        got = _state(t.read_where("n_tok", lo, hi))
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("n_tok") >= lo)
        if hi is not None:
            pred = pred & (F.col("n_tok") <= hi)
        assert got == _state(t.read().filter(pred)), (lo, hi)


def test_stats_survive_compact_and_rebucket(spark, tmp_path):
    t = _mk(spark, tmp_path / "c")
    t.merge(
        rows_df(spark, [(f"d{i}", i, "s") for i in range(80)]), epoch=0
    )
    t.compact()
    assert all(
        "stats" in f for f in t.manifest()["files"]
    ), "full rewrite must re-record stats"
    t.rebucket(8)
    files = t.manifest()["files"]
    assert all("stats" in f for f in files)
    got = _state(t.read_where("n_tok", 10, 19))
    assert len(got) == 10


def test_all_null_and_missing_stats_are_conservative(spark, tmp_path):
    t = _mk(spark, tmp_path / "n")
    t.merge(
        rows_df(spark, [("a", None, "s"), ("b", None, "s")]), epoch=0
    )
    t.merge(rows_df(spark, [("c", 5, "s")]), epoch=1)
    # all-null file is skipped for a bounded range but its rows are simply
    # not qualifying anyway — equality holds
    got = _state(t.read_where("n_tok", 0, 10))
    assert [r[0] for r in got] == ["c"]
    # a table created WITHOUT the property records no stats and never prunes
    t2 = SnapTable(spark, str(tmp_path / "p"))
    t2.create(SCHEMA, key="doc_id", num_buckets=2)
    t2.merge(rows_df(spark, [("x", 1, "s")]), epoch=0)
    assert all("stats" not in f for f in t2.manifest()["files"])
    assert _state(t2.read_where("n_tok", 0, 10)) == _state(t2.read())


def test_clustered_compaction_prunes_within_buckets(spark, tmp_path):
    """compact(target_files_per_bucket=k, cluster_by=col): each bucket
    splits into range-clustered files (hash repartitioning alone can never
    split a bucket), so a narrow read_where touches a fraction of each
    bucket's files. State unchanged; stats re-recorded."""
    t = _mk(spark, tmp_path / "z")
    t.merge(
        rows_df(
            spark,
            [(f"d{i}", (i * 37) % 1000, "s") for i in range(1500)],
        ),
        epoch=0,
    )
    before = _state(t.read())
    r = t.compact(target_files_per_bucket=4, cluster_by="n_tok")
    assert r["compacted"]
    from collections import Counter

    per_bucket = Counter(f["bucket"] for f in t.manifest()["files"])
    assert max(per_bucket.values()) > 1, "clustering must split buckets"
    assert _state(t.read()) == before

    pv = t.prune_preview("n_tok", 0, 99)
    assert pv["base_files_read"] < pv["base_files"] / 2
    got = _state(t.read_where("n_tok", 0, 99))
    assert got == _state(t.read().filter("n_tok between 0 and 99"))


def test_plain_compact_target_splits_by_key_range(spark, tmp_path):
    t = _mk(spark, tmp_path / "k")
    t.merge(
        rows_df(spark, [(f"d{i:04d}", i, "s") for i in range(1200)]), epoch=0
    )
    t.compact(target_files_per_bucket=3)
    from collections import Counter

    per_bucket = Counter(f["bucket"] for f in t.manifest()["files"])
    assert max(per_bucket.values()) > 1
    assert t.read().count() == 1200


def test_lookup_uses_key_stats_within_bucket(spark, tmp_path):
    """With the merge key declared in stats_columns and a range-split
    compaction, a point read touches only the file whose key range covers
    the probe — on top of bucket pruning."""
    t = SnapTable(spark, str(tmp_path / "lk"))
    t.create(
        SCHEMA, key="doc_id", num_buckets=2,
        properties={"stats_columns": ["doc_id", "n_tok"]},
    )
    t.merge(
        rows_df(spark, [(f"d{i:04d}", i, "s") for i in range(1000)]), epoch=0
    )
    t.compact(target_files_per_bucket=5)  # key-range split
    files = t.manifest()["files"]
    assert all("doc_id" in f.get("stats", {}) for f in files)

    # engine-level answer correctness (all probe classes)
    got = {r["doc_id"]: r["n_tok"] for r in
           t.lookup(["d0003", "d0997", "nope"]).collect()}
    assert got == {"d0003": 3, "d0997": 997}

    # pruning: the pruned-manifest state for one probe reads fewer files
    # than the bucket alone holds (white-box via the same predicate)
    probe = "d0003"
    in_range = [
        f for f in files
        if f["stats"]["doc_id"][0] <= probe <= f["stats"]["doc_id"][1]
    ]
    assert len(in_range) < len(files) / 2


def test_lookup_null_key_with_stats(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "ln"))
    t.create(
        SCHEMA, key="doc_id", num_buckets=2,
        properties={"stats_columns": ["doc_id"]},
    )
    t.merge(
        rows_df(spark, [("a", 1, "s"), (None, 2, "s"), ("b", 3, "s")]),
        epoch=0,
    )
    got = {r["doc_id"]: r["n_tok"] for r in t.lookup([None, "b"]).collect()}
    assert got == {None: 2, "b": 3}


def test_bloom_columns_write_bitsets_and_survive_compact(spark, tmp_path):
    """bloom_columns writes parquet-mr Bloom bitsets on every data path
    (merge stage, rewrite, compact): same data with blooms on is
    measurably larger on disk (the bitsets), point lookups stay exact,
    and a compaction keeps writing them. Min/max key stats can barely
    prune within a hash bucket (keys are randomized by the bucketing);
    blooms are the skipping structure for hashed layouts."""
    import os as _os

    from embulk_filter_expand_json_spark.streaming.pipeline import (
        SEQUENCES_SCHEMA,
    )
    from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

    def disk_bytes(t):
        total = 0
        for root, _d, names in _os.walk(t.data_dir):
            total += sum(
                _os.path.getsize(_os.path.join(root, n))
                for n in names if n.endswith(".parquet")
            )
        return total

    rows = [(f"doc-{i:05d}", [i], 1, "s", False) for i in range(4000)]

    def mk(path, props):
        t = SnapTable(spark, str(path))
        t.create(SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
                 properties=props)
        df = spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "is_del boolean",
        )
        t.merge(df, epoch=0, delete_col="is_del")
        return t

    plain = mk(tmp_path / "plain", None)
    bloom = mk(tmp_path / "bloom",
               {"bloom_columns": ["doc_id"], "bloom_ndv": 4000})
    b_plain, b_bloom = disk_bytes(plain), disk_bytes(bloom)
    assert b_bloom > b_plain + 1024, (b_plain, b_bloom)

    # lookups stay exact through the bloom-written files
    got = {r["doc_id"] for r in bloom.lookup(["doc-00007", "doc-03999"]).collect()}
    assert got == {"doc-00007", "doc-03999"}

    # compaction rewrites carry the bitsets too
    bloom.compact()
    assert disk_bytes(bloom) > disk_bytes(plain) + 1024
    assert bloom.read().count() == 4000


def test_pipeline_bloom_knobs_reach_table_properties(spark, tmp_path):
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    log = str(tmp_path / "log")
    write_changes(
        spark,
        ChangeGenConfig(n_events=500, n_docs=30, batch_size=500, seed=3),
        log,
    )
    pipe = CdcPipeline(
        spark, log, str(tmp_path / "t"), num_buckets=2,
        bloom_columns=["doc_id"], bloom_ndv=1000,
    )
    props = pipe.table.manifest()["properties"]
    assert props["bloom_columns"] == ["doc_id"]
    assert props["bloom_ndv"] == 1000
    pipe.run()
    assert pipe.table.read().count() > 0
