"""The other half of the min_mor_base_bytes story: ABOVE the floor,
merge-on-read deferral must WIN (that's why the knob is a floor, not an
off-switch). Build a base big enough that each bucket exceeds the 64 MiB
floor, then apply a trickle of small epochs twice in one session:

- A (r3 default): buckets are above the floor and the deltas are tiny
  relative to base -> epochs DEFER as delta files (write amplification
  ~delta-sized); reads resolve only the dirty buckets (bucket-scoped MoR).
- B (forced CoW): min_mor_base_bytes = 1 TiB -> every epoch rewrites every
  touched bucket's base files.

Writes bench_results/mor_bigbase.json.
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


def main() -> None:
    base_events = int(os.environ.get("MOR_BASE_EVENTS", "12000000"))
    trickle_epochs = 4
    trickle_events = int(os.environ.get("MOR_TRICKLE_EVENTS", "50000"))
    # ~2.5M distinct docs -> ~190 MB of base parquet over 2 buckets: each
    # bucket lands ABOVE the 64 MiB min_mor_base_bytes floor, so the r3
    # default genuinely defers (the floor is exercised, not bypassed)
    n_buckets = 2

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
        .config("spark.driver.memory", "10g")
        .appName("mor-bigbase")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    work = tempfile.mkdtemp(
        prefix="mor_big_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    # two logs over the SAME doc space: one big base-load epoch, then small
    # trickle epochs (epoch numbers shifted by +1 when applied)
    log_base = os.path.join(work, "log_base")
    log_trickle = os.path.join(work, "log_trickle")
    n_docs = base_events // 4
    write_changes(
        spark,
        ChangeGenConfig(n_events=base_events, n_docs=n_docs,
                        batch_size=base_events, seed=42),
        log_base,
    )
    write_changes(
        spark,
        ChangeGenConfig(n_events=trickle_epochs * trickle_events,
                        n_docs=n_docs,
                        batch_size=trickle_events, seed=43),
        log_trickle,
    )

    # untimed session warmup so the first variant doesn't absorb JVM/
    # committer/codegen startup
    warm = CdcPipeline(
        spark, log_trickle, os.path.join(work, "table_warm"),
        num_buckets=n_buckets, collect_metrics=False,
    )
    warm.run(max_epochs=2)
    shutil.rmtree(os.path.join(work, "table_warm"), ignore_errors=True)

    results = {}
    for name, floor in (("mor_defer_r3", None), ("forced_cow", 1 << 40)):
        table = os.path.join(work, f"table_{name}")
        kw = {} if floor is None else {"min_mor_base_bytes": floor}
        pipe = CdcPipeline(spark, log_base, table, num_buckets=n_buckets,
                           collect_metrics=False, **kw)
        t0 = time.time()
        pipe.run()
        base_sec = round(time.time() - t0, 3)
        # the trickle: same table, new pipeline over the trickle log with
        # shifted epochs (the table's watermark is 0 after the base load)
        pipe2 = CdcPipeline(spark, log_trickle, table, num_buckets=n_buckets,
                            collect_metrics=False, **kw)
        epochs = [e for e in pipe2.available_epochs()]
        t0 = time.time()
        for e in epochs:
            pipe2.apply_micro_batch(
                pipe2._read_changes().filter(f"epoch = {e}"), epoch=e + 1
            )
        trickle_sec = round(time.time() - t0, 3)
        man = pipe2.table.manifest()
        n_delta = sum(1 for f in man["files"] if f.get("kind") == "delta")
        t0 = time.time()
        rows = pipe2.table.read().count()
        read_sec = round(time.time() - t0, 3)
        results[name] = {
            "base_load_sec": base_sec,
            "trickle_sec_total": trickle_sec,
            "trickle_sec_per_epoch": round(trickle_sec / trickle_epochs, 3),
            "delta_files_outstanding": n_delta,
            "read_sec": read_sec,
            "final_rows": rows,
        }
        print(json.dumps({name: results[name]}), file=sys.stderr)
        shutil.rmtree(table, ignore_errors=True)

    summary = {
        "metric": "mor_defer_vs_forced_cow_above_floor",
        "shape": (
            f"{base_events} base events, {trickle_epochs}x{trickle_events} "
            f"trickle epochs, {n_buckets} buckets, local[32]"
        ),
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
        "trickle_speedup": round(
            results["forced_cow"]["trickle_sec_total"]
            / results["mor_defer_r3"]["trickle_sec_total"],
            2,
        ),
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "bench_results", "mor_bigbase.json"), "w") as f:
        json.dump(summary, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
