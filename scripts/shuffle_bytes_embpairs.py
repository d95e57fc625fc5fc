"""Shuffle-bytes evidence for the embedding near-dup slimming (VERDICT r2
finding #3): run the OLD plan shape (vectors carried on both sides of the
LSH-bucket self-join) and the NEW plan (ids-only candidates, vectors
re-joined once) on the same planted-fixture input, and report total shuffle
write bytes per variant from Spark's AppStatusStore.

Writes bench_results/embpairs_shuffle.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def total_shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle write bytes across executors (AppStatusStore —
    the same totals the Spark UI executors tab shows)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def old_embedding_near_dup_pairs(df, dim, threshold, n_bits, seed):
    """The round-2 plan shape, reproduced for the A/B only: embeddings ride
    BOTH sides of the bucket self-join."""
    from pyspark.sql import functions as F

    from embulk_filter_expand_json_spark.operators.similarity import (
        _norm,
        lsh_signatures,
    )

    sigs = lsh_signatures(df, dim, n_bits, seed)
    vecs = df.select(F.col("vec_id"), F.col("embedding")).join(sigs, on="vec_id")
    a = vecs.select(F.col("sig"), F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("v_a"))
    b = vecs.select(F.col("sig"), F.col("vec_id").alias("id_b"),
                    F.col("embedding").alias("v_b"))
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = _norm(F.col("v_a").cast("array<double>"))
    nb = _norm(F.col("v_b").cast("array<double>"))
    cos = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return (
        a.join(b, on="sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("embpairs-shuffle-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_expand_json_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001))
        .cast("array<float>")
        .alias("embedding"),
    )
    un = emb.unionByName(planted).cache()
    dim = len(un.first()["embedding"])
    n_rows = un.count()  # materialize the cache outside the measurement

    results = {}
    s0 = total_shuffle_write_bytes(spark)
    new_rows = embedding_near_dup_pairs(un, dim=dim, threshold=0.99).count()
    s1 = total_shuffle_write_bytes(spark)
    old_rows = old_embedding_near_dup_pairs(un, dim, 0.99, 10, 42).count()
    s2 = total_shuffle_write_bytes(spark)

    results = {
        "metric": "embedding_near_dup_shuffle_bytes",
        "input_rows": n_rows,
        "dim": dim,
        "pairs_new": new_rows,
        "pairs_old": old_rows,
        "shuffle_bytes_new": s1 - s0,
        "shuffle_bytes_old": s2 - s1,
        "reduction_factor": round((s2 - s1) / max(s1 - s0, 1), 2),
    }
    print(json.dumps(results))
    with open(os.path.join(REPO, "bench_results", "embpairs_shuffle.json"), "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
