"""Per-epoch phase profile of the CDC replay at the bench shape.

Prints one line per epoch: wall, merge phase timings (stage/decide/
rewrite/publish), plus the residual (expansion-plan build, lineage,
manifest reads). Drives the same code path bench.py times as cdc_replay.

Usage: python scripts/profile_replay.py [sf_dir] [cpus]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-bench" if os.path.isdir("/dev/shm") else "/tmp/spark-bench",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
    from embulk_filter_expand_json_spark.streaming import snaptable as st

    n_events_tbl = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()
    n_changes = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", str(n_events_tbl * 5)))
    work = tempfile.mkdtemp(
        prefix="prof_cdc_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    merge_results = []
    orig_merge = st.SnapTable.merge

    def spying_merge(self, *a, **kw):
        r = orig_merge(self, *a, **kw)
        # keep only the COMMITTED merge per epoch: a drift-abort epoch
        # calls merge twice, which would shift the epoch/result pairing
        if not r.get("aborted"):
            merge_results.append(r)
        return r

    st.SnapTable.merge = spying_merge
    try:
        cfg = ChangeGenConfig(
            n_events=n_changes,
            n_docs=max(n_changes // 20, 100),
            batch_size=max(n_changes // 8, 1000),
            seed=42,
        )
        log_path = os.path.join(work, "log")
        write_changes(spark, cfg, log_path)
        n_buckets = int(
            os.environ.get(
                "SPARK_GRAFT_BUCKETS", str(max(8, min(32, n_changes // 60_000)))
            )
        )
        pipe = CdcPipeline(
            spark,
            log_path,
            os.path.join(work, "table"),
            num_buckets=n_buckets,
            collect_metrics=False,
            changelog=True,
        )
        t0 = time.time()
        metrics = pipe.run()
        total = time.time() - t0
        for m, r in zip(metrics, merge_results):
            ph = r.get("timings", {})
            resid = round(m.wall_sec - sum(ph.values()), 3)
            print(
                json.dumps(
                    {
                        "epoch": m.epoch,
                        "wall": round(m.wall_sec, 3),
                        **ph,
                        "residual": resid,
                        "buckets": r.get("buckets_touched"),
                        "rewritten": r.get("files_rewritten"),
                    }
                )
            )
        print(
            json.dumps(
                {
                    "total_sec": round(total, 3),
                    "epochs": len(metrics),
                    "events_per_sec": round(n_changes / total, 1),
                    "n_buckets": n_buckets,
                    "n_changes": n_changes,
                }
            )
        )
    finally:
        st.SnapTable.merge = orig_merge
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
