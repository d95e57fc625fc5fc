"""Scale evidence for incremental view maintenance.

The claim is NOT that a sync beats a from-scratch GROUP BY at toy scale — a
2M-row columnar scan is sub-second and nothing beats it locally. The claim
is the asymptotics that matter at 10^10 rows:

1. **Sync cost is flat in table size** (it reads the feed window + the
   changed keys' dirty buckets at two versions), while the from-scratch
   aggregation grows linearly with the table. The sweep below measures both
   at 2M and 8M rows: scratch must ~4x, sync must stay ~flat.
2. **In the point-trickle regime** (changed keys <= MAX_LOOKUP_KEYS, so the
   images are manifest-bucket-pruned literal lookups) the sync wins
   outright already at 8M rows on this box.

Sync timings INCLUDE the view's exactly-once merge write; scratch is a
read-only collect (a handicap against the incremental path). Each sync
consumes a fresh trickle epoch; epochs are committed OUTSIDE the timed
region. One JSON line -> bench_results/aggview_incremental.json.

    python scripts/aggview_bench.py
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
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    burn = _burn_probe()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
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

    from embulk_filter_expand_json_spark.streaming.aggview import (
        IncrementalAggView,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import (
        SEQUENCES_SCHEMA,
    )
    from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

    def mkdelta(count, tag):
        return spark.range(count).select(
            F.concat(
                F.lit("doc-"), F.lpad(F.col("id").cast("string"), 9, "0")
            ).alias("doc_id"),
            F.array(F.lit(1), F.lit(2)).alias("tokens"),
            (F.pmod(F.xxhash64("id", F.lit(tag)), F.lit(500)) + 1)
            .cast("int")
            .alias("n_tok"),
            F.concat(
                F.lit("src"),
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(64)).cast("string"),
            ).alias("source"),
            F.lit(False).alias("is_del"),
        )

    def run_config(n_rows, n_trickle, buckets):
        work = tempfile.mkdtemp(prefix="aggview_bench_")
        t = SnapTable(spark, os.path.join(work, "tbl"))
        t.create(
            SEQUENCES_SCHEMA,
            key="doc_id",
            num_buckets=buckets,
            properties={"changelog": True, "changelog_keep": 16},
        )
        t.merge(mkdelta(n_rows, 0), epoch=0, delete_col="is_del")
        view = IncrementalAggView(
            spark,
            t,
            os.path.join(work, "view"),
            group_col="source",
            sum_cols=["n_tok"],
        )
        t0 = time.time()
        view.sync()
        initial_full = time.time() - t0

        def scratch():
            t0 = time.time()
            t.read().groupBy("source").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
            ).collect()
            return time.time() - t0

        def sync(epoch):
            t.merge(
                mkdelta(n_rows, 100 + epoch)
                .sample(fraction=min(1.0, 2.0 * n_trickle / n_rows), seed=epoch)
                .limit(n_trickle),
                epoch=epoch,
                delete_col="is_del",
            )
            t0 = time.time()
            r = view.sync()
            assert not r["full_rebuild"]
            return time.time() - t0

        def scan_bytes():
            """Exact manifest arithmetic — the asymptotic evidence. A sync
            reads the feed window + the dirty buckets at two versions; a
            scratch aggregation reads every base/delta file. Wall clock at
            toy scale is fixed-job-overhead-dominated (a 50 MB columnar
            scan is sub-second locally), so bytes are the honest metric of
            what each approach costs as the table grows."""
            cur = t.manifest()
            last_v = view.synced_version()
            entries = [
                e
                for e in cur.get("changes", [])
                if e["version"] > last_v - 1  # last window
            ][-1:]
            feed_b = sum(f["bytes"] for e in entries for f in e["files"])
            dirty = {f["bucket"] for e in entries for f in e["files"]}
            table_b = sum(f.get("bytes", 0) for f in cur["files"])
            dirty_b = sum(
                f.get("bytes", 0)
                for f in cur["files"]
                if f["bucket"] in dirty
            )
            return {
                "scratch_scan_bytes": table_b,
                "sync_scan_bytes": feed_b + 2 * dirty_b,
                "dirty_buckets": len(dirty),
            }

        # ABBA interleave
        s1 = sync(1)
        c1 = scratch()
        c2 = scratch()
        s2 = sync(2)
        bts = scan_bytes()
        shutil.rmtree(work, ignore_errors=True)
        return {
            "n_rows": n_rows,
            "n_trickle": n_trickle,
            "buckets": buckets,
            "initial_full_sec": round(initial_full, 3),
            "sync_sec": [round(s1, 3), round(s2, 3)],
            "scratch_sec": [round(c1, 3), round(c2, 3)],
            **bts,
        }

    # the design rule (snaptable.py module doc) sizes bucket count WITH the
    # table (0.25-1 GB/bucket at the 100 TB target), so the sweep scales
    # buckets 64 -> 256 as rows scale 2M -> 8M while the trickle stays
    # fixed: sync bytes must stay ~FLAT while scratch bytes grow ~4x.
    sweep = [
        run_config(2_000_000, 48, 64),
        run_config(8_000_000, 48, 256),
    ]
    # honestly-reported worst case: a trickle wide enough to dirty every
    # bucket (5k uniform keys over 32 buckets) reads ~2x the table — the
    # regime where a from-scratch aggregation is simply the better plan
    wide = run_config(8_000_000, 5_000, 32)

    small, big = sweep
    rec = {
        "metric": "aggview_incremental_vs_scratch",
        "sweep": sweep,
        "wide_trickle_worst_case": wide,
        "scratch_bytes_growth_4x_data": round(
            big["scratch_scan_bytes"] / max(small["scratch_scan_bytes"], 1), 2
        ),
        "sync_bytes_growth_4x_data": round(
            big["sync_scan_bytes"] / max(small["sync_scan_bytes"], 1), 2
        ),
        "bytes_ratio_at_8m": round(
            big["scratch_scan_bytes"] / max(big["sync_scan_bytes"], 1), 2
        ),
        "wall_speedup_at_8m": round(
            min(big["scratch_sec"]) / min(big["sync_sec"]), 2
        ),
        "cpus": cpus,
        "burn_start": burn,
        "burn_end": _burn_probe(),
    }
    print(json.dumps(rec))
    out = os.path.join(REPO, "bench_results", "aggview_incremental.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
