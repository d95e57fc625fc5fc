"""MinHash/LSH dedup scale record (VERDICT r4 item 6): bound the band
join's within-band quadratic term by EVIDENCE at 10x the bench corpus.

Corpus construction (deterministic, derived from the driver's testdata —
no synthesized distributions): replica k of the sf0.1 documents table
Caesar-shifts every letter/digit by k, so replicas share essentially no
char-5-gram shingles with each other (cross-replica Jaccard ~0) while
keeping length/structure identical. Each replica then plants the same
every-50th-doc ' zzz' clone the contract fixture uses. True near-dup
pairs therefore scale EXACTLY linearly with the replica count, so any
superlinear growth in candidates/verifies/wall-time is the algorithm's
own quadratic term showing — the thing this record exists to bound.

Usage: python scripts/minhash_scale.py [sf_dir]
Writes bench_results/minhash_scale_r5.json.
"""

import json
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from embulk_filter_expand_json_spark.operators.dedup_text import (  # noqa: E402
    minhash_lsh_candidates,
    minhash_lsh_pairs,
)


def shifted(col, k: int):
    if k == 0:
        return col
    low = string.ascii_lowercase
    up = string.ascii_uppercase
    dig = string.digits
    src = low + up + dig
    dst = (
        low[k % 26:] + low[: k % 26]
        + up[k % 26:] + up[: k % 26]
        + dig[k % 10:] + dig[: k % 10]
    )
    return F.translate(col, src, dst)


def corpus(spark, sf_dir: str, replicas: int):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    parts = []
    for k in range(replicas):
        rep = base.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            shifted(F.col("text"), k).alias("text"),
        )
        clones = rep.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        )
        parts.append(rep.unionByName(clones))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).localCheckpoint(eager=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    record = {"sf_dir": sf_dir, "cpus": int(cpus), "points": []}
    for replicas in (1, 3, 10):
        docs = corpus(spark, sf_dir, replicas)
        n_docs = docs.count()
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.8, verify="exact"
        ).count()
        pairs_sec = time.time() - t0
        t0 = time.time()
        n_cand = minhash_lsh_candidates(docs).count()
        cand_sec = time.time() - t0
        point = {
            "replicas": replicas,
            "docs": n_docs,
            "candidates": n_cand,
            "verified_pairs": n_pairs,
            "pairs_wall_sec": round(pairs_sec, 2),
            "candidates_only_wall_sec": round(cand_sec, 2),
        }
        record["points"].append(point)
        print(json.dumps(point))
        docs.unpersist()

    p1, p10 = record["points"][0], record["points"][-1]
    record["scale_factor_docs"] = round(p10["docs"] / p1["docs"], 2)
    record["scale_factor_wall"] = round(
        p10["pairs_wall_sec"] / p1["pairs_wall_sec"], 2
    )
    record["scale_factor_candidates"] = round(
        p10["candidates"] / max(p1["candidates"], 1), 2
    )
    out = os.path.join(REPO, "bench_results", "minhash_scale_r5.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: v for k, v in record.items() if k != "points"}))
    spark.stop()


if __name__ == "__main__":
    main()
