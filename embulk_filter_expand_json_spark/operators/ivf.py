"""IVF (inverted-file) approximate nearest neighbour index.

The second ANN scale path next to the LSH index in operators/similarity.py
(the classic FAISS IVF-Flat layout, re-expressed on Spark storage):

- **Train**: k-means centroids on a deterministic SAMPLE collected to the
  driver (FAISS trains IVF coarse quantizers on a sample too — the
  quantizer needs representativeness, not the full table). Sample size is
  bounded (``max_sample``) so the collect is metadata-sized at any table
  scale. Fixed seed + fixed Lloyd iteration count + sorted sample order
  make the centroids bit-deterministic.
- **Assign + store**: every vector goes to its nearest centroid by COSINE
  (vectors and centroids L2-normalized before the argmax — so scaling a
  vector never changes its list, which also makes planted scaled-clone
  fixtures provably co-listed with their source). Assignment is one numpy
  matmul per Arrow batch (mapInPandas), then the table is written
  ``partitionBy(list_id)`` — the probe is a partition-pruned scan.
- **Probe**: rank centroids against the query on the driver (n_lists × dim
  floats — tiny), read only the top ``n_probes`` list partitions, exact
  cosine top-k over that slice (O(n_probes/n_lists) of the data).

At 100 TB: training cost is constant (sample), the build is one signature
pass + one shuffle on list_id (same budget as build_lsh_index), and each
query touches n_probes partitions. Skewed lists (a hot centroid) would
make one partition large; the standard fix is to split hot lists by
re-clustering — not needed at the synthetic data's spread.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .similarity import cosine_topk


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_centroids(
    sample: np.ndarray, n_lists: int, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Spherical k-means (cosine) on the sample: normalized vectors,
    centroids re-normalized each round; empty clusters re-seeded
    deterministically from the RNG stream. Returns (n_lists, dim) float32,
    L2-normalized."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample.astype(np.float32))
    n = x.shape[0]
    if n < n_lists:
        raise ValueError(f"sample of {n} rows cannot seed {n_lists} lists")
    cents = x[rng.choice(n, size=n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members) == 0:
                cents[c] = x[rng.randint(n)]
            else:
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def _sample_vectors(
    df: DataFrame, id_col: str, vec_col: str, max_sample: int
) -> np.ndarray:
    """Deterministic bounded sample: the max_sample smallest ids. A fixed
    predicate (not .sample()) so the training set — hence the centroids —
    is identical across runs and partitionings."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_sample)
        .collect()
    )
    return np.array([list(r[1]) for r in rows], dtype=np.float32)


def _assign_lists(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, embedding, list_id): one numpy matmul per Arrow batch."""
    bc = cents  # closure capture; (n_lists, dim) float32, tiny

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            )
            lid = (mat @ bc.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "list_id": lid,
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(vec_col, df.schema[vec_col].dataType),
            T.StructField("list_id", T.IntegerType()),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(fn, schema)


def build_ivf_index(
    df: DataFrame,
    dim: int,
    path: str,
    n_lists: int = 64,
    seed: int = 42,
    iters: int = 10,
    max_sample: int = 20_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index at ``path``: data under ``data/``
    partitioned by list_id, centroids under ``centroids.json`` (n_lists×dim
    floats — the coarse quantizer is driver-sized by construction)."""
    sample = _sample_vectors(df, id_col, vec_col, max_sample)
    cents = train_centroids(sample, n_lists, seed, iters)
    assigned = _assign_lists(df, cents, vec_col, id_col)
    (
        assigned.repartition("list_id")
        .write.mode("errorifexists")
        .partitionBy("list_id")
        .parquet(os.path.join(path, "data"))
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)


def _load_centroids(path: str) -> np.ndarray:
    with open(os.path.join(path, "centroids.json")) as f:
        return np.array(json.load(f), dtype=np.float32)


def _probe_lists(
    path: str,
    query: Sequence[float],
    n_probes: int,
    cents: Optional[np.ndarray] = None,
) -> List[int]:
    if cents is None:
        cents = _load_centroids(path)
    q = _normalize(np.asarray(query, dtype=np.float32)[None, :])[0]
    order = np.argsort(-(cents @ q), kind="stable")
    return [int(i) for i in order[:n_probes]]


def ivf_index_topk(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k against a materialized IVF index: exact cosine over only
    the ``n_probes`` nearest lists (a partition-pruned scan)."""
    probes = _probe_lists(path, query, n_probes)
    part = spark.read.parquet(os.path.join(path, "data")).filter(
        F.col("list_id").isin(probes)
    )
    return cosine_topk(part, query, k, vec_col, id_col)


def ivf_index_topk_many(
    spark,
    path: str,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    n_probes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ANN: top-k for MANY queries in ONE job — the realistic shape
    at scale (per-query jobs pay Spark's scheduling floor each; batch
    scoring pays one pruned scan for the union of probed lists).

    Per partition row batch: one numpy matmul against the query block,
    masked so each row only scores queries that probed its list. The
    per-query top-k is a (query_id, cosine) window over candidates only —
    candidate cardinality is O(n_queries * n_probes * list_size), far
    below the table. Scoring keeps queries in float64 (truncating to
    float32 measurably flips rounded cosines) and rounds/ties exactly like
    cosine_topk, so per-query results match ivf_index_topk up to float
    summation order under the 1e-6 rounding grid.
    """
    from pyspark.sql import Window

    qmat = np.asarray(queries, dtype=np.float64)
    # load the centroid matrix ONCE for the whole batch (re-reading the
    # JSON per query cost n_queries redundant file parses on the driver)
    cents = _load_centroids(path)
    probes = [
        set(_probe_lists(path, q, n_probes, cents=cents)) for q in queries
    ]
    all_lists = sorted(set().union(*probes))
    # per-list boolean mask over queries: row in list L scores query j
    # only if j probed L
    mask_by_list = {
        lid: np.array([lid in p for p in probes], dtype=bool)
        for lid in all_lists
    }
    qn = np.linalg.norm(qmat, axis=1)

    part = spark.read.parquet(os.path.join(path, "data")).filter(
        F.col("list_id").isin([int(x) for x in all_lists])
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.IntegerType()),
            T.StructField(id_col, part.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            dots = mat @ qmat.T  # (rows, n_queries)
            denom = norms[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, 0.0)
            lids = pdf["list_id"].to_numpy()
            rows_id, rows_q, rows_c = [], [], []
            for lid in np.unique(lids):
                m = mask_by_list[int(lid)]
                sel = lids == lid
                ids = pdf[id_col].to_numpy()[sel]
                sub = cos[sel][:, m]
                qidx = np.nonzero(m)[0]
                rows_id.append(np.repeat(ids, len(qidx)))
                rows_q.append(np.tile(qidx, sel.sum()))
                rows_c.append(sub.ravel())
            if not rows_id:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(rows_q).astype(np.int32),
                    id_col: np.concatenate(rows_id),
                    "cosine": np.concatenate(rows_c),
                }
            )

    cand = part.select(id_col, vec_col, "list_id").mapInPandas(fn, out_schema)
    # round in Catalyst (HALF_UP) so per-query results match cosine_topk's
    # rounding/tie rules exactly, not numpy's banker's rounding
    cand = cand.withColumn("cosine", F.round("cosine", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
