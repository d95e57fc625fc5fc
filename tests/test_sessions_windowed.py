"""Sessionization, IVF ANN, streaming windowed agg, stateful transitions.

Correctness on crafted micro-fixtures plus the plan-quality contracts the
100 TB design depends on (single exchange, partition-pruned probes,
watermark late-data semantics)."""

import glob
import os
import shutil

import numpy as np
import pytest

from pyspark.sql import Row, functions as F

from embulk_filter_expand_json_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=u,
                event_type=et,
            )
            for i, (ts, u, et) in enumerate(rows)
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_sessionize_gap_boundaries(spark):
    ev = _mk_events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "a"),
            ("2024-01-01 00:29:59", 1, "b"),  # 29:59 gap -> same session
            ("2024-01-01 00:59:59", 1, "c"),  # exactly 30:00 -> same (strict >)
            ("2024-01-01 01:30:00", 1, "d"),  # 30:01 -> new session
            ("2024-01-01 00:00:00", 2, "e"),  # other user independent
        ],
    )
    got = {
        (r["event_id"], r["session_seq"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {(0, 1), (1, 1), (2, 1), (3, 2), (4, 1)}


def test_session_stats_values(spark):
    ev = _mk_events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "a"),
            ("2024-01-01 00:10:00", 1, "b"),
            ("2024-01-01 02:00:00", 1, "c"),
        ],
    )
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_us"] == 600_000_000
    assert s1["start_us"] == 1_704_067_200_000_000  # 2024-01-01T00:00Z
    assert rows[(1, 2)]["n_events"] == 1


def test_session_stats_single_exchange(spark):
    """The group-by on (user, session_seq) must REUSE the window's
    HashPartitioning(user) — [user] is a subset of the grouping keys, so
    ClusteredDistribution is already satisfied: exactly ONE exchange."""
    ev = _mk_events(spark, [("2024-01-01 00:00:00", 1, "a")])
    plan = session_stats(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_epoch_extraction_ignores_session_timezone(spark):
    """NTZ wall-clock -> epoch-micros must not move with
    spark.sql.session.timeZone (the naive to_utc_timestamp pinning DOES
    move — +5h under America/New_York; see functions/timeutil.py)."""
    from embulk_filter_expand_json_spark.streaming.windowed import (
        window_start_us,
        windowed_counts,
    )

    ev = _mk_events(spark, [("2024-01-01 00:10:00", 1, "a")])
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            s = session_stats(ev).first()
            w = window_start_us(windowed_counts(ev)).first()
            results[tz] = (s["start_us"], w["window_start_us"])
        assert len(set(results.values())) == 1, results
        assert results["UTC"] == (1_704_067_800_000_000, 1_704_067_200_000_000)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_chunked_sessionizer_stitches_chains(spark):
    """A session spanning THREE chunk boundaries (events every 20 min
    across 4 hours with 1h chunks) must stitch into one session; the
    chunked output must equal the plain sessionizer exactly."""
    from embulk_filter_expand_json_spark.operators.sessions import (
        session_stats_chunked,
    )

    rows = [(f"2024-01-01 {h:02d}:{m:02d}:00", 1, "a")
            for h in range(4) for m in (0, 20, 40)]
    rows.append(("2024-01-01 09:00:00", 1, "b"))  # separate session
    rows.append(("2024-01-01 00:30:00", 2, "c"))  # other user
    ev = _mk_events(spark, rows)
    plain = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    chunked = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in session_stats_chunked(ev, gap_minutes=30, chunk_hours=1).collect()
    }
    assert chunked == plain
    assert plain[(1, 1)][0] == 12  # the chain stitched across 3 boundaries
    # pass-1 exchange is (user, chunk) — hot users split; pass-2 is over
    # summaries only: exactly two exchanges total
    plan = (
        session_stats_chunked(ev, chunk_hours=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan


def test_sessionizers_match_python_reference_randomized(spark):
    """200 random users in one DataFrame, gaps drawn to hit the nasty
    spots — exact-gap ties (merge under <=... no: strict >, so exact gap
    MERGES), chunk-boundary adjacency, empty-chunk chains, single events.
    Plain and chunked sessionizers must both equal an independent
    pure-Python reference."""
    import numpy as np

    from pyspark.sql import Row

    from embulk_filter_expand_json_spark.operators.sessions import (
        session_stats_chunked,
    )

    gap_us = 30 * 60 * 1_000_000
    chunk_us = 3600 * 1_000_000
    rng = np.random.RandomState(99)
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00Z
    rows, expected = [], {}
    eid = 0
    for u in range(200):
        n = int(rng.randint(1, 12))
        t = base_us + int(rng.randint(0, 48 * chunk_us))
        times = []
        for _ in range(n):
            times.append(t)
            kind = rng.randint(4)
            if kind == 0:
                step = int(gap_us)  # exactly the gap -> same session
            elif kind == 1:
                step = int(gap_us) + 1  # just over -> new session
            elif kind == 2:
                # land exactly on the next chunk boundary
                step = chunk_us - (t % chunk_us)
                step = step if step > 0 else chunk_us
            else:
                step = int(rng.randint(1, 2 * gap_us))
            t += step
        # python reference
        sess, seq = [], 0
        prev = None
        for tt in times:
            if prev is None or tt - prev > gap_us:
                seq += 1
                sess.append([tt, tt, 0])
            sess[-1][1] = tt
            sess[-1][2] += 1
            prev = tt
        for i, (s, e, c) in enumerate(sess, start=1):
            expected[(u, i)] = (c, s, e)
        for tt in times:
            rows.append(Row(user_id=u, t_us=tt, event_id=eid))
            eid += 1
    ev = spark.createDataFrame(rows).select(
        "user_id",
        F.timestamp_micros(F.col("t_us")).alias("ts"),
        "event_id",
    )
    for fn in (
        lambda d: session_stats(d, gap_minutes=30),
        lambda d: session_stats_chunked(d, gap_minutes=30, chunk_hours=1),
    ):
        got = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"], r["start_us"], r["end_us"],
            )
            for r in fn(ev).collect()
        }
        assert got == expected


def test_ivf_index_prunes_and_recalls(spark, tmp_path):
    from embulk_filter_expand_json_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal((400, 16)).astype("float32")
    q = base[0]
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in base[i]])
        for i in range(400)
    ]
    # planted scaled clones of the query: same list by construction
    # (spherical assignment is scale-invariant)
    rows += [
        Row(vec_id=1000 + j, embedding=[float(x * (1 + j / 100)) for x in q])
        for j in range(1, 5)
    ]
    df = spark.createDataFrame(rows).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(df, dim=16, path=path, n_lists=8, max_sample=500)
    out = ivf_index_topk(spark, path, [float(x) for x in q], k=5, n_probes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [list_id" in plan  # pruned probe, not a scan
    ids = [r["vec_id"] for r in out.collect()]
    assert set(ids) == {0, 1001, 1002, 1003, 1004}  # cosine-1.0 family


def test_ivf_topk_many_matches_per_query(spark, tmp_path):
    """Batch probing (one pruned scan for all queries) must return exactly
    what per-query probing returns, query by query."""
    from embulk_filter_expand_json_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
        ivf_index_topk_many,
    )

    rng = np.random.RandomState(5)
    base = rng.standard_normal((300, 12)).astype("float32")
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(300)]
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    path = str(tmp_path / "ivf_many")
    build_ivf_index(df, dim=12, path=path, n_lists=8, max_sample=400)
    queries = [[float(x) for x in base[i]] for i in (0, 7, 42)]
    many = ivf_index_topk_many(spark, path, queries, k=5, n_probes=3)
    got = {}
    for r in many.collect():
        got.setdefault(r["query_id"], set()).add((r["vec_id"], r["cosine"]))
    assert set(got) == {0, 1, 2}
    for qi, q in enumerate(queries):
        single = {
            (r["vec_id"], r["cosine"])
            for r in ivf_index_topk(spark, path, q, k=5, n_probes=3).collect()
        }
        assert got[qi] == single


def test_ivf_centroids_deterministic():
    from embulk_filter_expand_json_spark.operators.ivf import train_centroids

    x = np.random.RandomState(3).standard_normal((200, 8)).astype("float32")
    a = train_centroids(x, n_lists=4, seed=42)
    b = train_centroids(x, n_lists=4, seed=42)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def _feed_files(spark, df, d, n_files, order_col="event_id"):
    """Time-ordered file feed — the driver contract's writer IS the
    implementation under test, so tests reuse it rather than fork it."""
    import __spark_entry__ as S

    S._feed_time_ordered_files(spark, df, d, n_files, order_col=order_col)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    """Complete-mode availableNow over a file feed == batch GROUP BY."""
    from embulk_filter_expand_json_spark.streaming.windowed import (
        window_start_us,
        windowed_counts,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "in")
    _feed_files(spark, ev, src, 3)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("wc_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start_us"], r["event_type"]): r["n_events"]
        for r in window_start_us(spark.table("wc_t")).collect()
    }
    want = {
        (r["window_start_us"], r["event_type"]): r["n_events"]
        for r in window_start_us(windowed_counts(ev)).collect()
    }
    assert got == want and len(want) > 10


def test_windowed_counts_drops_late_events(spark, tmp_path):
    """APPEND mode emits each window exactly once when the watermark closes
    it; a later event for an already-closed window is dropped. The feed
    spreads over four batches because watermark advancement is one batch
    behind the data that moves it, and eviction runs at end-of-batch:
      b0: 00:10        -> hour-0 state opens
      b1: 03:00        -> watermark (next batch) = 02:50
      b2: 03:05 spacer -> hour-0 closes, EMITTED once (count 1), evicted
      b3: 00:20 late   -> behind the watermark, window closed: dropped
    """
    from embulk_filter_expand_json_spark.streaming.windowed import (
        window_start_us,
        windowed_counts,
    )

    feed = [
        _mk_events(spark, [("2024-01-01 00:10:00", 1, "a")]),
        _mk_events(spark, [("2024-01-01 03:00:00", 1, "a")]),
        _mk_events(spark, [("2024-01-01 03:05:00", 1, "a")]),
        _mk_events(spark, [("2024-01-01 00:20:00", 1, "a")]),  # late
    ]
    src = str(tmp_path / "late_in")
    os.makedirs(src)
    for i, df in enumerate(feed):
        stage = str(tmp_path / f"_s{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema(feed[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wc_late")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = window_start_us(spark.table("wc_late")).collect()
    h0 = [r["n_events"] for r in rows if r["window_start_us"] == 1_704_067_200_000_000]
    assert h0 == [1]  # emitted exactly once, late event never counted


def test_session_windows_stream_equals_batch_sessionizer(spark, tmp_path):
    """F.session_window streaming sessionization must produce exactly the
    batch gap-sessionizer's sessions (boundary semantics coincide when no
    pair of events is exactly gap apart — true for the testdata)."""
    from embulk_filter_expand_json_spark.streaming.windowed import (
        session_windows,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "sw_in")
    _feed_files(spark, ev, src, 3)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_windows(stream, gap_minutes=30)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sw_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["start_us"], r["last_us"], r["n_events"])
        for r in spark.table("sw_t").collect()
    }
    want = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert got == want and len(want) > 500


def test_stateful_transitions_cross_batch(spark, tmp_path):
    """State must carry the last event across micro-batches: with one
    event per file, every transition pairs events from DIFFERENT batches."""
    from embulk_filter_expand_json_spark.streaming.stateful import (
        transitions_stateful,
    )

    ev = _mk_events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 00:01:00", 1, "click"),
            ("2024-01-01 00:02:00", 1, "buy"),
            ("2024-01-01 00:00:30", 2, "view"),
        ],
    )
    src = str(tmp_path / "tr_in")
    _feed_files(spark, ev, src, 4)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        transitions_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tr_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["prev_type"], r["event_type"])
        for r in spark.table("tr_t").collect()
    }
    assert got == {(1, "view", "click"), (1, "click", "buy")}
