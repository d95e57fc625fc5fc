"""Similarity search over embedding columns (array<float>).

- **Brute-force top-k cosine** — the exact baseline: broadcast the query
  vector as a literal array, `zip_with` dot product (pure Catalyst, no
  Python), orderBy + limit (Spark's TakeOrdered avoids a full sort).
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic from seed) computed by a vectorized numpy pandas UDF;
  search probes only the query's bucket (optionally multi-probe by flipping
  signature bits), turning an O(N) scan into an O(N/2^bits) bucket read. At
  100 TB the signature table would be bucketed/partitioned on the signature
  so probes are partition-pruned scans.
- **Embedding-cosine near-dup pairs** — all-pairs above a cosine threshold
  via the same LSH buckets (join within buckets), i.e. the embedding member
  of the dedup family in operators/dedup_text.py.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _dot_literal(vec_col: str, query: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity. Ties broken by id ascending so the
    result is total-order deterministic (and oracle-comparable)."""
    qn = float(np.sqrt(np.dot(query, query)))
    dot = _dot_literal(vec_col, query)
    denom = _norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)
    cos = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_vector: bool = False,
) -> DataFrame:
    """(id[, embedding], sig) random-hyperplane signatures; numpy matmul per
    Arrow batch (one BLAS call per batch, no per-row Python).
    ``carry_vector=True`` passes the embedding through the same pass — the
    index build needs (id, vector, sig) without a second join/shuffle."""
    planes = _hyperplanes(dim, n_bits, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            sig = ((mat @ planes.T) > 0).astype(np.int64) @ weights
            out = {id_col: pdf[id_col]}
            if carry_vector:
                out[vec_col] = pdf[vec_col]
            out["sig"] = sig
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType
    fields = [T.StructField(id_col, id_type)]
    if carry_vector:
        fields.append(T.StructField(vec_col, df.schema[vec_col].dataType))
    fields.append(T.StructField("sig", T.LongType()))
    return df.select(id_col, vec_col).mapInPandas(fn, T.StructType(fields))


def _probe_signatures(
    query: Sequence[float], n_bits: int, n_probes: int, seed: int
) -> List[int]:
    """Query signature + the (n_probes-1) nearest buckets by 1-bit flips in
    |margin| order — standard multi-probe LSH."""
    q = np.asarray(query, dtype=np.float32)
    planes = _hyperplanes(len(q), n_bits, seed)
    margins = planes @ q
    base = int(((margins > 0).astype(np.int64) * (1 << np.arange(n_bits))).sum())
    probes: List[int] = [base]
    for bit in np.argsort(np.abs(margins))[: max(n_probes - 1, 0)]:
        probes.append(base ^ (1 << int(bit)))
    return probes


def build_lsh_index(
    df: DataFrame,
    dim: int,
    path: str,
    n_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the ANN index: (id, embedding) written PARTITIONED BY the
    LSH signature. This is the storage half of the index lifecycle — a
    query probes O(n_probes) of the 2^n_bits partitions as a
    partition-pruned scan (no full-table signature recompute per query,
    which the on-the-fly ``lsh_topk`` pays). One signature pass + one
    shuffle on sig; at 100 TB, n_bits sizes partitions to ~table/2^n_bits."""
    sigs = lsh_signatures(
        df, dim, n_bits, seed, vec_col, id_col, carry_vector=True
    )
    (
        sigs.repartition("sig")
        .write.mode("errorifexists")
        .partitionBy("sig")
        .parquet(path)
    )


def read_lsh_index(
    spark,
    path: str,
    query: Sequence[float],
    n_bits: int = 12,
    n_probes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Partition-pruned read of the probed buckets only."""
    probes = _probe_signatures(query, n_bits, n_probes, seed)
    return spark.read.parquet(path).filter(F.col("sig").isin(probes))


def lsh_index_topk(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    n_bits: int = 12,
    n_probes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k against a materialized index: exact cosine over only the
    probed partitions (a pruned scan of n_probes/2^n_bits of the data)."""
    bucket = read_lsh_index(spark, path, query, n_bits, n_probes, seed)
    return cosine_topk(bucket, query, k, vec_col, id_col)


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_bits: int = 12,
    n_probes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k WITHOUT a materialized index: recomputes signatures over
    the full table per query. Correct but the wrong storage story at scale
    — prefer ``build_lsh_index`` + ``lsh_index_topk`` (partition-pruned
    probes); this form remains for one-shot/exploratory queries."""
    q = np.asarray(query, dtype=np.float32)
    probes = _probe_signatures(query, n_bits, n_probes, seed)
    sigs = lsh_signatures(df, len(q), n_bits, seed, vec_col, id_col)
    bucket_ids = sigs.filter(F.col("sig").isin(probes)).select(id_col)
    bucket = df.join(F.broadcast(bucket_ids), on=id_col)
    return cosine_topk(bucket, query, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine >= threshold, candidates restricted to equal
    LSH buckets (high-cosine pairs collide with high probability; raise
    n_bits for precision, lower for recall).

    Shuffle discipline (VERDICT r2 finding #3): the bucket self-join moves
    (sig, id) rows ONLY — at 1k-dim float embeddings the vectors would
    dominate shuffle bytes if they rode both sides. Vectors are re-joined
    once per side onto the (tiny) deduped candidate set, mirroring the
    ids-only band join in dedup_text.minhash_lsh_pairs."""
    # materialize (sig, id) before the self-join and the candidate pairs
    # before the two vector joins: each is referenced by two independent
    # plan branches, which would otherwise re-run the signature projection
    # (dim x n_bits dot products per vector) and the bucket join twice.
    # Both tables are ids-only — signature-table-sized and pair-sized.
    sigs = lsh_signatures(df, dim, n_bits, seed, vec_col, id_col).localCheckpoint(
        eager=True
    )
    a = sigs.select(F.col("sig"), F.col(id_col).alias("id_a"))
    b = sigs.select(F.col("sig"), F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, on="sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    pairs = cand.join(
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")),
        on="id_a",
    ).join(
        vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")),
        on="id_b",
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = _norm(F.col("v_a").cast("array<double>"))
    nb = _norm(F.col("v_b").cast("array<double>"))
    cos = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
