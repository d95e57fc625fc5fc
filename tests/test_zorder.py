"""Multi-column Z-order clustering (streaming/zorder.py + compact()).

What must hold:
- the Catalyst z-value expression equals the pure-Python Morton oracle
  for the same cuts (bit interleave and rank-against-cuts both);
- compact(cluster_by=[a, b]) yields files whose recorded min/max are
  narrow on BOTH columns, so read_where prunes on either dimension —
  whereas single-column clustering only ever prunes on its one column;
- pruning never changes answers (equality vs read().filter()), including
  NULLs in a z-order column (they rank first).
"""

import random

import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.streaming.pipeline import SEQUENCES_SCHEMA
from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable
from embulk_filter_expand_json_spark.streaming.zorder import (
    interleave_bits,
    z_value_column,
)


def test_interleave_bits_known_values():
    # bit i of column j -> bit i*k + j
    assert interleave_bits([0b11, 0b01], bits=2) == 0b0111
    assert interleave_bits([0, 0], bits=4) == 0
    assert interleave_bits([0b1, 0b0, 0b1], bits=1) == 0b101
    # 6-bit max ranks for two columns fill 12 bits
    assert interleave_bits([63, 63], bits=6) == (1 << 12) - 1


def test_z_value_column_matches_python_oracle(spark):
    rng = random.Random(11)
    rows = [(f"d{i}", rng.randrange(10_000), rng.randrange(10_000))
            for i in range(3_000)]
    df = spark.createDataFrame(rows, "doc_id string, x long, y long")
    zcol, cuts = z_value_column(df, ["x", "y"], bits=6, sample_rows=3_000)
    got = df.withColumn("z", zcol).select("x", "y", "z").collect()

    def rank(v, cs):
        # raw predecessor count, scaled to the full 6-bit width (the
        # low-cardinality fairness rule — see z_value_column)
        raw = sum(1 for c in cs if v >= c)
        return raw * 63 // len(cs) if cs else 0

    for r in got:
        expect = interleave_bits(
            [rank(r["x"], cuts["x"]), rank(r["y"], cuts["y"])], bits=6
        )
        assert r["z"] == expect, (r["x"], r["y"])


def test_z_value_column_guards():
    with pytest.raises(ValueError, match=">= 2 columns"):
        z_value_column(None, ["x"])
    with pytest.raises(ValueError, match="> 63"):
        z_value_column(None, list("abcdefghij"), bits=7)


@pytest.fixture(scope="module")
def corpus(spark):
    """Rows with two INDEPENDENT skippable dimensions: n_tok uniform ints,
    source a zero-padded string — independence is what makes one-column
    clustering useless for the other column."""
    rng = random.Random(5)
    return [
        (f"doc-{i:05d}", [i], rng.randrange(100_000),
         f"s{rng.randrange(1000):04d}", False)
        for i in range(4_000)
    ]


def _load(spark, tmp_path, corpus, name):
    t = SnapTable(spark, str(tmp_path / name))
    t.create(
        SEQUENCES_SCHEMA, key="doc_id", num_buckets=2,
        properties={"stats_columns": ["n_tok", "source"]},
    )
    df = spark.createDataFrame(
        corpus,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "is_del boolean",
    )
    t.merge(df, epoch=0, delete_col="is_del")
    return t


def test_zorder_compact_prunes_on_both_dims(spark, tmp_path, corpus):
    t = _load(spark, tmp_path, corpus, "z")
    # 16 files/bucket = 4 z-bits = a 4x4 grid per bucket on the two dims;
    # at 8 files the grid is 4x2 and boundary-straddling files (range
    # boundaries equalize ROW counts, not grid cells) eat the margin
    t.compact(target_files_per_bucket=16, cluster_by=["n_tok", "source"])
    pn = t.prune_preview("n_tok", 10_000, 19_999)
    ps = t.prune_preview("source", "s0100", "s0199")
    assert pn["base_files"] >= 16
    # a 10% slice of either dimension must skip most files
    assert pn["base_files_read"] <= pn["base_files"] / 2, pn
    assert ps["base_files_read"] <= ps["base_files"] / 2, ps
    # and pruning never changes the answer
    for col, lo, hi in (("n_tok", 10_000, 19_999),
                        ("source", "s0100", "s0199")):
        got = sorted(r["doc_id"] for r in t.read_where(col, lo, hi).collect())
        want = sorted(
            r["doc_id"]
            for r in t.read().filter(F.col(col).between(lo, hi)).collect()
        )
        assert got == want


def test_single_column_cluster_cannot_prune_other_dim(spark, tmp_path, corpus):
    t = _load(spark, tmp_path, corpus, "one")
    t.compact(target_files_per_bucket=8, cluster_by="n_tok")
    pn = t.prune_preview("n_tok", 10_000, 19_999)
    ps = t.prune_preview("source", "s0100", "s0199")
    assert pn["base_files_read"] <= pn["base_files"] / 2
    # independent dimension: every file spans ~the whole source range
    assert ps["base_files_read"] == ps["base_files"]


def test_zorder_with_nulls_keeps_answers(spark, tmp_path):
    rng = random.Random(9)
    rows = [
        (f"doc-{i:05d}", [i],
         None if i % 7 == 0 else rng.randrange(100_000),
         f"s{rng.randrange(1000):04d}", False)
        for i in range(1_500)
    ]
    t = _load(spark, tmp_path, rows, "nulls")
    t.compact(target_files_per_bucket=6, cluster_by=["n_tok", "source"])
    got = sorted(
        r["doc_id"] for r in t.read_where("n_tok", 0, 50_000).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in t.read().filter(F.col("n_tok").between(0, 50_000)).collect()
    )
    assert got == want
    assert t.read().count() == 1_500  # NULL rows intact in the table


def test_zorder_low_cardinality_dim_still_prunes(spark, tmp_path):
    """8-distinct-value column next to a 100k-cardinality one: without
    full-bit-width rank scaling the wide column's high bits own the
    z-order and the narrow column gets zero skipping (the contract-gate
    regression this pins)."""
    rng = random.Random(3)
    rows = [
        (f"doc-{i:05d}", [i], rng.randrange(100_000),
         f"src{rng.randrange(8)}", False)
        for i in range(4_000)
    ]
    t = _load(spark, tmp_path, rows, "lowcard")
    t.compact(target_files_per_bucket=16, cluster_by=["n_tok", "source"])
    ps = t.prune_preview("source", "src2", "src4")
    pn = t.prune_preview("n_tok", 10_000, 19_999)
    assert ps["base_files_read"] < ps["base_files"], ps
    assert pn["base_files_read"] < pn["base_files"], pn


def test_zorder_list_of_one_falls_back_to_range(spark, tmp_path, corpus):
    t = _load(spark, tmp_path, corpus, "list1")
    t.compact(target_files_per_bucket=8, cluster_by=["n_tok"])
    pn = t.prune_preview("n_tok", 10_000, 19_999)
    assert pn["base_files_read"] <= pn["base_files"] / 2
