"""Multimodal (image/audio/video) column handling for training-data ingest.

Design: media lives as opaque ``binary`` columns next to typed metadata
(mime, width/height, sample rate...), exactly how a 100 TB multimodal lake
stores it. All transforms are Arrow-batched ``mapInPandas`` stages so the
bytes never round-trip through per-row Python calls and the schema /
partitioning / batch shape is production-real.

The actual codecs (Pillow / libsndfile / ffmpeg) are NOT in this container,
so the decode kernel is pluggable: ``decoder='real'`` raises
NotImplementedError at the import site (clearly marked), while the default
``decoder='fake'`` is a deterministic stand-in (bytes -> seeded pixel/PCM
tensors) that keeps every Spark-side contract — schemas, null handling,
batch iteration, feature shapes — fully testable. Swapping in a real codec
is a one-function change on the executor side only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table (no external data)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, F.lit("image/png"))
        .when(F.col("id") % 3 == 1, F.lit("image/jpeg"))
        .otherwise(F.lit("audio/wav"))
        .alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(512)) + 16)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(512)) + 16)
        .cast("int")
        .alias("height"),
        F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("data"),
    )


def _fake_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: bytes -> (h, w) uint8."""
    digest = hashlib.sha256(data or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def _real_decode(data: bytes, width: int, height: int) -> np.ndarray:
    # Real codec path — requires Pillow, which is not available in this
    # environment. The Spark-side plumbing around this function (schemas,
    # batching, partitioning) is identical for both decoders.
    raise NotImplementedError(
        "image decoding requires Pillow; install it and swap decoder='real'"
    )


def image_features(
    df: DataFrame,
    decoder: str = "fake",
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Decode + extract per-image features (mean/std/p99 intensity,
    aspect ratio) as an Arrow-batched stage. Nulls propagate as null rows."""
    decode = {"fake": _fake_decode, "real": _real_decode}[decoder]

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField("std_intensity", T.DoubleType()),
            T.StructField("p99_intensity", T.DoubleType()),
            T.StructField("aspect_ratio", T.DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mean = np.full(n, np.nan)
            std = np.full(n, np.nan)
            p99 = np.full(n, np.nan)
            ar = np.full(n, np.nan)
            for i in range(n):
                data = pdf[data_col].iloc[i]
                w = pdf["width"].iloc[i]
                h = pdf["height"].iloc[i]
                if data is None or w is None or h is None:
                    continue
                img = decode(bytes(data), int(w), int(h))
                mean[i] = float(img.mean())
                std[i] = float(img.std())
                p99[i] = float(np.percentile(img, 99))
                ar[i] = float(w) / float(h)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mean_intensity": mean,
                    "std_intensity": std,
                    "p99_intensity": p99,
                    "aspect_ratio": ar,
                }
            )

    return df.select(id_col, "width", "height", data_col).mapInPandas(
        fn, out_schema
    )


def resize_images(
    df: DataFrame,
    target: int = 64,
    decoder: str = "fake",
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw bytes). The
    resize itself is pure numpy indexing (vectorized); output keeps the
    binary-column convention so stages compose."""
    decode = {"fake": _fake_decode, "real": _real_decode}[decoder]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas = [], []
            for i in range(len(pdf)):
                data = pdf[data_col].iloc[i]
                w, h = pdf["width"].iloc[i], pdf["height"].iloc[i]
                if data is None or w is None or h is None:
                    ids.append(pdf[id_col].iloc[i])
                    datas.append(None)
                    continue
                img = decode(bytes(data), int(w), int(h))
                yi = (np.arange(target) * img.shape[0] // target).astype(int)
                xi = (np.arange(target) * img.shape[1] // target).astype(int)
                resized = img[np.ix_(yi, xi)]
                ids.append(pdf[id_col].iloc[i])
                datas.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": target,
                    "height": target,
                    "data": datas,
                }
            )

    return df.select(id_col, "width", "height", data_col).mapInPandas(
        fn, out_schema
    )


def frame_sample_plan(
    df: DataFrame,
    fps: float = 1.0,
    duration_col: str = "duration_sec",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts). Pure
    Catalyst (sequence + explode) — the expensive decode would consume this
    plan partition-parallel; here the plan itself is the tested contract."""
    n_frames = F.greatest(
        (F.col(duration_col) * F.lit(fps)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i.cast("double") / F.lit(fps),
            )
        ).alias("frame_ts"),
    )
