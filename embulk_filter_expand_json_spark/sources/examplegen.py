"""Deterministic generator for the reference's example workload (FIXTURES.md
F5, mirroring /root/reference/example/config.yml:19-32 + data.tsv shape):
rows of (time, id, name, score, json_payload) where json_payload carries
phone_numbers (array), app_id, point, created_at, and a nested profile with
like_words + anniversary. Fully distributed, seeded — no external data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_WORDS = [
    "embulk", "jruby", "spark", "arrow", "parquet", "filter",
    "expand", "json", "vector", "column",
]


def generate_example_rows(
    spark: SparkSession, n: int = 100, seed: int = 42
) -> DataFrame:
    idx = F.col("id")

    def h(salt: int):
        return F.xxhash64(idx, F.lit(seed), F.lit(salt))

    word = lambda salt: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(h(salt), F.lit(len(_WORDS))) + 1).cast("int"),
    )
    phone = F.concat(
        F.lit("090-"),
        F.lpad(F.pmod(h(1), F.lit(10_000)).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(F.pmod(h(2), F.lit(10_000)).cast("string"), 4, "0"),
    )
    payload = F.to_json(
        F.struct(
            F.array(phone).alias("phone_numbers"),
            F.pmod(h(3), F.lit(100_000)).alias("app_id"),
            (F.pmod(h(4), F.lit(10_000)).cast("double") / 100.0).alias("point"),
            F.date_format(
                F.date_add(F.lit("2015-01-01"), F.pmod(h(5), F.lit(365)).cast("int")),
                "yyyy-MM-dd",
            ).alias("created_at"),
            F.struct(
                F.array(word(6), word(7), word(8)).alias("like_words"),
                F.struct(
                    word(9).alias("et"),
                    F.date_format(
                        F.date_add(
                            F.lit("2010-01-01"), F.pmod(h(10), F.lit(3650)).cast("int")
                        ),
                        "yyyy-MM-dd",
                    ).alias("wt"),
                ).alias("anniversary"),
            ).alias("profile"),
        )
    )
    return spark.range(n).select(
        F.timestamp_seconds(F.lit(1420070400) + idx * 60).alias("time"),
        idx.alias("id"),
        F.concat(F.lit("user_"), idx.cast("string")).alias("name"),
        (F.pmod(h(11), F.lit(1000)).cast("double") / 10.0).alias("score"),
        payload.alias("json_payload"),
    )
