"""Same-session A/B: cdc_replay at the BENCH shape (500k events, 8 epochs,
32 buckets) under (A) the round-3 SnapTable (min_mor_base_bytes CoW floor +
single-seq rewrite fast path + bucket-scoped MoR reads) vs (B) the actual
ROUND-2 SnapTable implementation, loaded verbatim from git history — the
code VERDICT r2 measured at 48 s on this shape. Same session, same input,
ABBA order, burn sentinels around each run.

Writes bench_results/ab_cow_mor.json.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _burn_one(_: int) -> int:
    h = hashlib.sha256(b"x")
    for _ in range(2_000_000):
        h = hashlib.sha256(h.digest())
    return 0


def burn() -> float:
    with mp.Pool(32) as p:
        p.map(_burn_one, range(32))
        t0 = time.time()
        p.map(_burn_one, range(32))
        return round(time.time() - t0, 3)


def main() -> None:
    n_events = int(os.environ.get("AB_EVENTS", "500000"))
    n_buckets = int(os.environ.get("AB_BUCKETS", "32"))
    epochs = 8

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-bench" if os.path.isdir("/dev/shm") else "/tmp/spark-bench",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("ab-cow-mor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    work = tempfile.mkdtemp(
        prefix="ab_cdc_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    log_path = os.path.join(work, "log")
    cfg = ChangeGenConfig(
        n_events=n_events,
        n_docs=max(n_events // 20, 100),
        batch_size=max(n_events // epochs, 1000),
        seed=42,
    )
    write_changes(spark, cfg, log_path)

    # B: the round-2 SnapTable, verbatim from git (commit 0479500 = the
    # state VERDICT r2 measured), imported under a private name and swapped
    # into the pipeline for the B runs only.
    import importlib.util
    import subprocess

    r2_src = subprocess.run(
        ["git", "-C", REPO, "show",
         "0479500:embulk_filter_expand_json_spark/streaming/snaptable.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    r2_path = os.path.join(work, "snaptable_r2.py")
    with open(r2_path, "w") as f:
        f.write(r2_src)
    spec = importlib.util.spec_from_file_location("snaptable_r2", r2_path)
    snaptable_r2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(snaptable_r2)

    import embulk_filter_expand_json_spark.streaming.pipeline as P

    snaptable_r3_cls = P.SnapTable

    variants = {
        "snaptable_r3": snaptable_r3_cls,
        "snaptable_r2": snaptable_r2.SnapTable,
    }
    # untimed warm-up replay: the first pipeline in a session pays JVM/
    # committer/codegen warmup that would bias whichever variant runs first
    warm = CdcPipeline(
        spark, log_path, os.path.join(work, "table_warm"),
        num_buckets=n_buckets, collect_metrics=False,
    )
    warm.run(max_epochs=2)
    shutil.rmtree(os.path.join(work, "table_warm"), ignore_errors=True)

    # ABBA within the session to split credit drain fairly
    order = ["snaptable_r3", "snaptable_r2", "snaptable_r2", "snaptable_r3"]
    results: dict = {k: [] for k in variants}
    runs = []
    for i, name in enumerate(order):
        b0 = burn()
        table = os.path.join(work, f"table_{i}")
        P.SnapTable = variants[name]
        try:
            pipe = CdcPipeline(
                spark,
                log_path,
                table,
                num_buckets=n_buckets,
                collect_metrics=False,
            )
            t0 = time.time()
            pipe.run()
            dt = round(time.time() - t0, 3)
            rows = pipe.table.read().count()
        finally:
            P.SnapTable = snaptable_r3_cls
        shutil.rmtree(table, ignore_errors=True)
        results[name].append(dt)
        runs.append({"variant": name, "order": i, "sec": dt,
                     "burn_32p_sec": b0, "final_rows": rows})
        print(json.dumps(runs[-1]), file=sys.stderr)

    summary = {
        "metric": "ab_snaptable_r3_vs_r2",
        "shape": f"{n_events} events, {epochs} epochs, {n_buckets} buckets, local[32]",
        "snaptable_r3_sec": sum(results["snaptable_r3"]) / 2,
        "snaptable_r2_sec": sum(results["snaptable_r2"]) / 2,
        "events_per_sec_r3": round(
            n_events / (sum(results["snaptable_r3"]) / 2), 1
        ),
        "events_per_sec_r2": round(
            n_events / (sum(results["snaptable_r2"]) / 2), 1
        ),
        "runs": runs,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "bench_results", "ab_cow_mor.json"), "w") as f:
        json.dump(summary, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
