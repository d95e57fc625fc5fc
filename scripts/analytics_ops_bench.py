"""Timing record for the round-3 analytics-layer operators at sf0.1.

Not part of bench.py's headline (kept stable for round-over-round
comparability); this is the measurement evidence that the new operators
are engineered, not just correct. One JSON line ->
bench_results/analytics_ops_sf0.1.json via run_analytics_bench.sh-style
invocation:

    python scripts/analytics_ops_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _burn_probe  # noqa: E402  (shared host-state sentinel)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    burn = _burn_probe()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # mirror bench.py's environment so the records are comparable:
        # ParallelGC (G1 contends at 32 allocation-heavy threads) and
        # tmpfs shuffle scratch
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-bench"
            if os.path.isdir("/dev/shm")
            else "/tmp/spark-bench",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_expand_json_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
    )
    from embulk_filter_expand_json_spark.operators.sessions import (
        session_stats,
        session_stats_chunked,
    )
    from embulk_filter_expand_json_spark.streaming.windowed import (
        windowed_counts,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_events = ev.count()
    n_vecs = emb.count()
    q: dict = {}

    t0 = time.time()
    n_sessions = session_stats(ev).count()
    q["sessionize_plain"] = round(time.time() - t0, 3)

    t0 = time.time()
    n2 = session_stats_chunked(ev, chunk_hours=1).count()
    q["sessionize_chunked"] = round(time.time() - t0, 3)
    assert n2 == n_sessions, (n2, n_sessions)

    t0 = time.time()
    windowed_counts(ev).count()  # batch form of the streaming agg
    q["windowed_counts_batch"] = round(time.time() - t0, 3)

    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    work = tempfile.mkdtemp(prefix="ivf_bench_")
    try:
        path = os.path.join(work, "ix")
        t0 = time.time()
        build_ivf_index(emb, dim=len(qvec), path=path, n_lists=64,
                        max_sample=20_000)
        q["ivf_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        for _ in range(10):
            ivf_index_topk(spark, path, qvec, k=10, n_probes=8).collect()
        q["ivf_probe_x10"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "analytics_ops_sec",
        "value": round(sum(q.values()), 3),
        "unit": "sec",
        "queries": q,
        "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
        "cpus": cpus,
        "n_events": n_events,
        "n_sessions": n_sessions,
        "n_vectors": n_vecs,
        **burn,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
