"""Noop-sink isolation benchmarks (optimization-guide §1.4) for the r6
optimization round. NOT the driver's bench — bench.py stays frozen; this
file exists so the per-operator numbers cited in OPTIMIZATION_r06.md are
reproducible. Prints one JSON line per probe.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-bench"
            if os.path.isdir("/dev/shm")
            else "/tmp/spark-bench",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("bench_extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from embulk_filter_expand_json_spark import expand_json
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        duplicate_spans,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    out: dict = {}

    def probe(name, fn, n=3):
        """min-of-n: robust to this host's burst-credit throttling."""
        best = float("inf")
        for _ in range(n):
            sc.setJobDescription(name)
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        sc.setJobDescription(None)
        out[name] = round(best, 3)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    events.count()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()

    cfg = {
        "json_column_name": "props",
        "expanded_columns": [{"name": "k", "type": "long"}],
    }
    probe("expand_catalyst_noop", lambda: noop(expand_json(events, cfg, mode="catalyst")))
    probe(
        "expand_catalyst_nofan_noop",
        lambda: noop(expand_json(events, cfg, mode="catalyst", fan_out=False)),
    )
    probe("expand_arrow_noop", lambda: noop(expand_json(events, cfg, mode="arrow")))

    probe("minhash_signatures_noop", lambda: noop(minhash_signatures(docs)))
    probe(
        "minhash_pairs_count",
        lambda: minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.8, verify="exact"
        ).count(),
    )
    probe("span_dedup_count", lambda: duplicate_spans(docs, window=15).count())

    print(json.dumps({"probes": out, "sf_dir": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
