"""asof_join — the union-merge temporal lookup join (operators/asof.py).

Covers backward/forward direction, exact-time matches, tolerance, no-match
null fill, NULL-key/NULL-time semantics, name suffixing, plan shape (ONE
exchange), and a 2,000-row randomized differential against DuckDB's native
ASOF JOIN.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.operators.asof import asof_join


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 3, 100.0), ("A", 10, 101.0), ("B", 5, 50.0), ("C", 1, 7.0)],
        "sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 2, 9.9), ("A", 3, 10.0), ("A", 8, 10.8), ("B", 6, 5.6)],
        "sym string, t long, bid double",
    )
    return trades, quotes


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_backward_basic(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t")
    assert out.columns == ["sym", "t", "px", "t_r", "bid"]
    assert _rows(out) == [
        ("A", 3, 100.0, 3, 10.0),   # exact-time match included
        ("A", 10, 101.0, 8, 10.8),  # nearest preceding
        ("B", 5, 50.0, None, None), # quote is later -> no match
        ("C", 1, 7.0, None, None),  # key absent on right
    ]


def test_forward_and_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    fwd = asof_join(trades, quotes, on="sym", left_time="t", direction="forward")
    assert _rows(fwd) == [
        ("A", 3, 100.0, 3, 10.0),
        ("A", 10, 101.0, None, None),
        ("B", 5, 50.0, 6, 5.6),
        ("C", 1, 7.0, None, None),
    ]
    tight = asof_join(trades, quotes, on="sym", left_time="t", tolerance=1)
    assert _rows(tight) == [
        ("A", 3, 100.0, 3, 10.0),
        ("A", 10, 101.0, None, None),  # gap of 2 > tolerance 1
        ("B", 5, 50.0, None, None),
        ("C", 1, 7.0, None, None),
    ]


def test_null_semantics(spark):
    left = spark.createDataFrame(
        [(None, 5), ("a", None), ("a", 4)], "k string, t long"
    )
    right = spark.createDataFrame(
        [(None, 1, "nullkey"), ("a", None, "nulltime"), ("a", 2, "ok")],
        "k string, t long, v string",
    )
    out = asof_join(left, right, on="k", left_time="t")
    got = {(r["k"], r["t"]): (r["t_r"], r["v"]) for r in out.collect()}
    # engine convention: NULL is one logical key
    assert got[(None, 5)] == (1, "nullkey")
    # NULL left time never matches; NULL right times are dropped
    assert got[("a", None)] == (None, None)
    assert got[("a", 4)] == (2, "ok")


def test_composite_key_and_timestamp_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:10:00"), (1, "y", "2024-01-01 00:10:00")],
        "uid long, grp string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00", 7.0), (1, "y", "2024-01-01 00:09:30", 8.0)],
        "uid long, grp string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        left, right, on=["uid", "grp"], left_time="ts", tolerance=60.0
    )  # seconds for timestamps
    got = {r["grp"]: r["v"] for r in out.collect()}
    assert got == {"x": None, "y": 8.0}


def test_single_exchange_plan(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one key-hash exchange feeding the window; unions/scans add none
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_differential_vs_duckdb_asof(spark):
    """2,000 trades x 1,000 quotes over 40 keys, random times: bit-equal to
    DuckDB's native ASOF LEFT JOIN (unique (key,time) on the right; no NULL
    keys — the two engines' documented divergences)."""
    import random

    rng = random.Random(7)
    trades = [(f"k{rng.randrange(40)}", rng.randrange(10_000), float(i)) for i in range(2000)]
    quotes_map = {}
    for i in range(1000):
        quotes_map[(f"k{rng.randrange(40)}", rng.randrange(10_000))] = float(i)
    quotes = [(k, t, v) for (k, t), v in quotes_map.items()]

    l = spark.createDataFrame(trades, "sym string, t long, px double")
    r = spark.createDataFrame(quotes, "sym string, t long, bid double")
    got = _rows(asof_join(l, r, on="sym", left_time="t"))

    con = duckdb.connect()
    con.execute("create table l(sym varchar, t bigint, px double)")
    con.execute("create table r(sym varchar, t bigint, bid double)")
    con.executemany("insert into l values (?,?,?)", trades)
    con.executemany("insert into r values (?,?,?)", quotes)
    want = sorted(
        tuple(row)
        for row in con.execute(
            "select l.sym, l.t, l.px, r.t, r.bid from l "
            "asof left join r on l.sym = r.sym and l.t >= r.t"
        ).fetchall()
    )
    assert got == want
