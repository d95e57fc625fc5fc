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
) -> DataFrame:
    """(id, sig int) random-hyperplane signatures; numpy matmul per Arrow
    batch (one BLAS call per batch, no per-row Python)."""
    planes = _hyperplanes(dim, n_bits, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            sig = ((mat @ planes.T) > 0).astype(np.int64) @ weights
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sig})

    id_type = df.schema[id_col].dataType
    return df.select(id_col, vec_col).mapInPandas(
        fn,
        T.StructType(
            [T.StructField(id_col, id_type), T.StructField("sig", T.LongType())]
        ),
    )


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
    """ANN top-k: exact cosine over only the query's LSH bucket plus the
    n_probes nearest buckets (1-bit flips in |margin| order — standard
    multi-probe LSH)."""
    q = np.asarray(query, dtype=np.float32)
    planes = _hyperplanes(len(q), n_bits, seed)
    margins = planes @ q
    base = int(((margins > 0).astype(np.int64) * (1 << np.arange(n_bits))).sum())
    flip_order = np.argsort(np.abs(margins))
    probes: List[int] = [base]
    for bit in flip_order[: max(n_probes - 1, 0)]:
        probes.append(base ^ (1 << int(bit)))

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
    n_bits for precision, lower for recall)."""
    sigs = lsh_signatures(df, dim, n_bits, seed, vec_col, id_col)
    vecs = df.select(F.col(id_col), F.col(vec_col)).join(sigs, on=id_col)
    a = vecs.select(
        F.col("sig"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
    )
    b = vecs.select(
        F.col("sig"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
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
        a.join(b, on="sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
