"""Same-session A/B: cdc_replay at the BENCH shape (500k events, 8 epochs,
32 buckets) under (A) the round-3 CoW floor (min_mor_base_bytes default:
small bases always take the plain rewrite, no delta machinery) vs (B) the
round-2 MoR decision rule (floor disabled, ratio 0.2 — what VERDICT r2
flagged as thrash at toy scale). Burn sentinels recorded around each run.

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

    variants = {
        # A: round-3 default — the floor routes every small-base epoch
        # through the plain CoW rewrite (staged winners, no delta window)
        "cow_floor_r3": {},
        # B: round-2 behavior — floor off, ratio 0.2 (defers, stacks,
        # force-compacts; the thrash VERDICT r2 reproduced)
        "mor_r2_rule": {"min_mor_base_bytes": 0},
    }
    # ABBA within the session to split credit drain fairly
    order = ["cow_floor_r3", "mor_r2_rule", "mor_r2_rule", "cow_floor_r3"]
    results: dict = {k: [] for k in variants}
    runs = []
    for i, name in enumerate(order):
        b0 = burn()
        table = os.path.join(work, f"table_{i}")
        pipe = CdcPipeline(
            spark,
            log_path,
            table,
            num_buckets=n_buckets,
            collect_metrics=False,
            **variants[name],
        )
        t0 = time.time()
        pipe.run()
        dt = round(time.time() - t0, 3)
        rows = pipe.table.read().count()
        shutil.rmtree(table, ignore_errors=True)
        results[name].append(dt)
        runs.append({"variant": name, "order": i, "sec": dt,
                     "burn_32p_sec": b0, "final_rows": rows})
        print(json.dumps(runs[-1]), file=sys.stderr)

    summary = {
        "metric": "ab_cow_floor_vs_mor_rule",
        "shape": f"{n_events} events, {epochs} epochs, {n_buckets} buckets, local[32]",
        "cow_floor_r3_sec": sum(results["cow_floor_r3"]) / 2,
        "mor_r2_rule_sec": sum(results["mor_r2_rule"]) / 2,
        "events_per_sec_cow": round(
            n_events / (sum(results["cow_floor_r3"]) / 2), 1
        ),
        "events_per_sec_mor_r2": round(
            n_events / (sum(results["mor_r2_rule"]) / 2), 1
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
