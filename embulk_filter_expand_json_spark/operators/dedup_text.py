"""Document deduplication operators for training-data pipelines.

Four families, each shaped for 100 TB scale:

- **exact**: group by content fingerprint, keep the smallest doc_id. One
  hash-shuffle with map-side partial aggregation; no Python.
- **MinHash + LSH**: shingle -> K minhashes -> B bands -> explode bands ->
  self-join within (band, signature) buckets. The full pipeline is pure
  Catalyst (`char_ngrams` + `transform`/`array_min` over xxhash64), so the
  signature computation rides whole-stage codegen; the candidate join is a
  shuffle on band keys only (never the O(n^2) cross join).
- **SimHash**: 64-bit sign-aggregated token hashes via a vectorized numpy
  pandas UDF (bit-parallel, Arrow-batched), candidates by 16-bit chunk
  equality (Hamming <= 3 guarantee via pigeonhole over 4 chunks).
- **n-gram Jaccard verify**: exact set Jaccard on candidate pairs only —
  the expensive exact measure runs on the (tiny) LSH candidate set, not on
  all pairs.

Embedding-cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from embulk_filter_expand_json_spark.functions.text import char_ngrams, fingerprint


# ---------------------------------------------------------------- exact dup

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact normalized content."""
    fp = fingerprint(F.col(text_col)).alias("__fp")
    others = [c for c in df.columns if c != id_col]
    return (
        df.select(fp, id_col, *others)
        .groupBy("__fp")
        .agg(F.min_by(F.struct(id_col, *others), F.col(id_col)).alias("__r"))
        .select([F.col(f"__r.{c}").alias(c) for c in [id_col] + others])
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, n_dups, doc_ids) for groups with >1 member."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ------------------------------------------------------------ MinHash + LSH

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """-> (id, minhash: array<long>[num_hashes]). Pure Catalyst:
    min over xxhash64(shingle, seed_i) per hash function."""
    shingles = F.array_distinct(char_ngrams(F.col(text_col), shingle_size))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__sh"), lambda s, i=i: F.xxhash64(s, F.lit(seed + i))
                )
            )
            for i in range(num_hashes)
        ]
    )
    return (
        df.select(F.col(id_col), shingles.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .select(F.col(id_col), sig.alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    est_jaccard = fraction of agreeing minhashes (the unbiased MinHash
    estimator). The band join only shuffles (band_idx, band_hash) keys:
    candidates collide in >=1 band; dedup pairs with min(band) so each pair
    is verified once.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, seed
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("minhash")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "minhash", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    left = banded.select(
        F.col("band"), F.col("bh"),
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"),
    )
    right = banded.select(
        F.col("band"), F.col("bh"),
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"),
    )
    cand = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.first("mh_a").alias("mh_a"),
            F.first("mh_b").alias("mh_b"),
        )
    )
    agree = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda a, b: a == b),
            lambda x: x,
        )
    )
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        cand.select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ------------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard, computed only for candidate (id_a, id_b)
    pairs (broadcast-joined shingle sets when small)."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(char_ngrams(F.col(text_col), shingle_size)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------- SimHash

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """64-bit SimHash via a vectorized pandas UDF (numpy bit-parallel):
    per token, a 64-bit hash votes +1/-1 per bit; the signature is the sign
    vector. Arrow-batched — no per-row Python function calls."""
    import zlib

    MASK = (1 << 64) - 1
    MIX = 0x9E3779B97F4A7C15

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            usig = np.zeros(len(pdf), dtype=np.uint64)
            texts = pdf[text_col].tolist()
            for i, t in enumerate(texts):
                if not t:
                    continue
                toks = t.lower().split()
                if not toks:
                    continue
                hashes = np.fromiter(
                    (
                        (zlib.crc32(tok.encode()) * MIX + seed) & MASK
                        for tok in toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
                bits = (hashes[:, None] >> bit_idx) & np.uint64(1)  # (n_tok, 64)
                votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
                usig[i] = ((votes > 0).astype(np.uint64) << bit_idx).sum(
                    dtype=np.uint64
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": usig.view(np.int64)}
            )

    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    return df.select(id_col, text_col).mapInPandas(
        fn,
        T.StructType(
            [
                T.StructField(id_col, id_type),
                T.StructField("simhash", T.LongType()),
            ]
        ),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming. Candidates: pigeonhole —
    any pair within Hamming 3 agrees exactly on >=1 of 4 16-bit chunks, so
    the join shuffles only (chunk_idx, chunk_value) keys. Recall is
    *guaranteed* for max_hamming <= 3 and best-effort above (a pair must
    still collide on one chunk to be considered)."""
    sigs = simhash(df, text_col, id_col, seed)
    chunks = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", F.col("ck.ci").alias("ci"), F.col("ck.cv").alias("cv"))
    a = chunks.select(
        "ci", "cv", F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a")
    )
    b = chunks.select(
        "ci", "cv", F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b")
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
