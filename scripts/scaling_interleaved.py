"""N -> 4N scaling evidence, counterbalanced (A/B/B/A) against credit drain.

The single-box caveat from round 1: this VM throttles CPU after sustained
load, so a fixed run order (N first, 4N second) confounds scaling efficiency
with burst-credit drain. This protocol fixes the confound:

- run order N, 4N, 4N, N — any monotone drift in machine speed hits both
  sizes symmetrically, and the two same-size runs bracket the other size;
- a multiprocess sha256 burn probe runs before every Spark run; its wall
  time is the throttle sentinel (flat probe walls = valid measurement);
- throughput per size = mean of its two runs; efficiency =
  (tput_4N / tput_N) / (4N / N).

Each run is a cold, taskset-pinned JVM (ParallelGC — G1 loses ~2x at 32
allocation-heavy threads in one JVM on this box) measuring two stages:
the expansion operator alone (the reference's own benchmark shape,
compute-dominant) and the full CDC replay (expand -> LWW dedup -> staged
CoW MERGE commit, shuffle + commit bound).

Usage: python scripts/scaling_interleaved.py [--events 8000000] [--epochs 4]
Writes bench_results/scaling_interleaved.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time
from shutil import which as shutil_which

RUNNER = r"""
import json, sys, time
from pyspark.sql import SparkSession

cpus = int(sys.argv[1])
log_path = sys.argv[2]
table_path = sys.argv[3]

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus * 2))
    .config("spark.sql.files.maxPartitionBytes", "33554432")
    .config("spark.local.dir", "/dev/shm/spark-scaling")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .appName(f"scaling-{cpus}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# stage 1: expansion operator alone (reference-comparable, compute-dominant)
from pyspark.sql import functions as Fn
from embulk_filter_expand_json_spark.operators.expand import expand_json
from embulk_filter_expand_json_spark.plans.expand_plan import (
    ExpandConfig, ExpandedColumn)
ecfg = ExpandConfig(
    json_column_name="payload",
    expanded_columns=(
        ExpandedColumn("doc_id", "string"), ExpandedColumn("tokens", "json"),
        ExpandedColumn("n_tok", "long"), ExpandedColumn("source", "string"),
        ExpandedColumn("lang", "string")),
    malformed_json_policy="invalid_record")
log_df = spark.read.parquet(log_path)
expand_json(log_df, ecfg).agg(Fn.count("doc_id")).collect()  # warm (codegen/JIT)
t0 = time.time()
expand_json(log_df, ecfg).agg(Fn.count("doc_id")).collect()
expand_sec = time.time() - t0

# stage 2: full replay (epoch 0 is warm-up, excluded on both sizes)
from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
pipe = CdcPipeline(spark, log_path, table_path, num_buckets=64,
                   collect_metrics=False)
t0 = time.time()
pipe.run(max_epochs=1)
warm = time.time() - t0
t0 = time.time()
metrics = pipe.run()
replay_sec = time.time() - t0
rows = pipe.table.read().count()

print(json.dumps({"cpus": cpus, "warmup_sec": round(warm, 2),
                  "replay_sec": round(replay_sec, 3),
                  "expand_sec": round(expand_sec, 3),
                  "epochs_measured": len(metrics),
                  "final_rows": rows}))
spark.stop()
"""


def _burn_one(_: int) -> int:
    h = hashlib.sha256(b"x")
    for _ in range(2_000_000):
        h = hashlib.sha256(h.digest())
    return 0


def burn_probe() -> dict:
    """Throttle sentinel: wall time of a fixed sha256 burn at 1 and 32
    procs. Rising walls across probes = the box is being throttled."""
    out = {}
    for n in (1, 32):
        with mp.Pool(n) as p:
            p.map(_burn_one, range(n))  # warm the pool
            t0 = time.time()
            p.map(_burn_one, range(n))
            out[f"burn_{n}p_sec"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="scaling_", dir=work_root)
    log_path = os.path.join(work, "log")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .appName("scaling-gen")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )

    cfg = ChangeGenConfig(
        n_events=args.events,
        n_docs=max(args.events // 20, 1000),
        batch_size=args.events // args.epochs,
        seed=42,
    )
    write_changes(spark, cfg, log_path)
    spark.stop()

    runner = os.path.join(work, "runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)

    order = [args.n, args.n4, args.n4, args.n]  # counterbalanced A/B/B/A
    runs = []
    env = dict(os.environ, PYTHONPATH=repo)
    for idx, cpus in enumerate(order):
        subprocess.run(["sync"], check=False)
        time.sleep(5)
        probe = burn_probe()
        table = os.path.join(work, f"table_{idx}")
        cmd = [sys.executable, runner, str(cpus), log_path, table]
        if shutil_which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env, check=True
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec.update(probe)
        rec["order"] = idx
        runs.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    measured = args.events - cfg.batch_size  # warm-up epoch excluded

    def mean_tput(cpus: int, field: str, events: int) -> float:
        secs = [r[field] for r in runs if r["cpus"] == cpus]
        return sum(events / s for s in secs) / len(secs)

    replay_n = mean_tput(args.n, "replay_sec", measured)
    replay_4n = mean_tput(args.n4, "replay_sec", measured)
    expand_n = mean_tput(args.n, "expand_sec", args.events)
    expand_4n = mean_tput(args.n4, "expand_sec", args.events)
    factor = args.n4 / args.n
    summary = {
        "metric": "scaling_interleaved_ABBA",
        "events_measured": measured,
        "n_cpus": args.n,
        "n4_cpus": args.n4,
        "replay_tput_n": round(replay_n, 1),
        "replay_tput_4n": round(replay_4n, 1),
        "replay_scaling_efficiency": round((replay_4n / replay_n) / factor, 3),
        "expand_tput_n": round(expand_n, 1),
        "expand_tput_4n": round(expand_4n, 1),
        "expand_scaling_efficiency": round((expand_4n / expand_n) / factor, 3),
        "runs": runs,
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(repo, "bench_results"), exist_ok=True)
    with open(
        os.path.join(repo, "bench_results", "scaling_interleaved.json"), "w"
    ) as f:
        json.dump(summary, f, indent=1)

    print(
        f"| stage | local[{args.n}] ev/s | local[{args.n4}] ev/s | efficiency |",
        file=sys.stderr,
    )
    print("| --- | --- | --- | --- |", file=sys.stderr)
    print(
        f"| expansion only | {expand_n:,.0f} | {expand_4n:,.0f} | "
        f"{(expand_4n/expand_n)/factor:.2f} |",
        file=sys.stderr,
    )
    print(
        f"| full CDC replay | {replay_n:,.0f} | {replay_4n:,.0f} | "
        f"{(replay_4n/replay_n)/factor:.2f} |",
        file=sys.stderr,
    )

    import shutil as _sh

    _sh.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
