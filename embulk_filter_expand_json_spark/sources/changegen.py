"""Deterministic synthetic CDC change stream (FIXTURES.md F6).

Binlog/WAL-style change events over the tokenized-sequence table
(BASELINE.json input_hint: doc_id string, tokens array<int32>, n_tok int32,
source string). Generation is FULLY DISTRIBUTED and deterministic — every
value is a pure function of the row id and the seed (hash-based), so any
scale factor can be produced without driver-side loops and reproduced
exactly for the pure-Python oracle.

Properties engineered into the stream (FIXTURES.md F6):
- ``log_offset`` strictly increasing, unique (the LWW order key)
- ``epoch = log_offset // batch_size`` (micro-batch id; parquet partition)
- ops I/U/D with configurable delete fraction; D payloads carry only doc_id
- Zipf-like skewed doc_id so a few hot keys exercise the salting path
- a deterministic fraction of payloads with an extra top-level key
  (``lang``) to drive additive schema evolution
- a deterministic fraction of invalid payloads: *malformed JSON* (truncated
  doc) and *bad-typed* fields (tokens as a string) to drive the
  invalid-record channel
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class ChangeGenConfig:
    n_events: int = 100_000
    n_docs: int = 10_000
    batch_size: int = 10_000  # events per epoch
    seed: int = 42
    zipf_q: float = 3.0  # doc_index = floor(n_docs * u^q): higher = more skew
    p_delete: float = 0.05
    p_extra_key: float = 0.10  # adds "lang" to the payload
    p_malformed: float = 0.002  # truncated JSON document
    p_badtype: float = 0.003  # tokens: "oops" (cast failure)
    max_tokens: int = 64
    vocab: int = 50_000
    n_sources: int = 8


def _u(col, seed: int, salt: int):
    """Deterministic uniform in [0,1) from a long column."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    # map to [0, 1): abs(h) / 2^63
    return (F.abs(h) % F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0)


def generate_changes(spark: SparkSession, cfg: ChangeGenConfig) -> DataFrame:
    """-> DataFrame(log_offset long, epoch long, op string, payload string).

    Payload JSON: {"doc_id": str, "tokens": [int...], "n_tok": int,
    "source": str} (+ optional "lang"); deletes carry only {"doc_id": ...}.
    """
    df = spark.range(cfg.n_events).withColumnRenamed("id", "log_offset")
    u_doc = _u(F.col("log_offset"), cfg.seed, 1)
    u_op = _u(F.col("log_offset"), cfg.seed, 2)
    u_extra = _u(F.col("log_offset"), cfg.seed, 3)
    u_bad = _u(F.col("log_offset"), cfg.seed, 4)

    doc_index = F.floor(F.lit(float(cfg.n_docs)) * F.pow(u_doc, F.lit(cfg.zipf_q)))
    doc_id = F.concat(F.lit("doc-"), F.lpad(doc_index.cast("string"), 8, "0"))
    n_tok = (
        F.pmod(F.xxhash64("log_offset", F.lit(cfg.seed), F.lit(5)), F.lit(cfg.max_tokens - 3))
        + F.lit(4)
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(
            F.xxhash64(F.col("log_offset"), i, F.lit(cfg.seed)), F.lit(cfg.vocab)
        ).cast("int"),
    )
    source = F.concat(
        F.lit("src"),
        F.pmod(F.xxhash64(doc_id, F.lit(cfg.seed), F.lit(6)), F.lit(cfg.n_sources)).cast(
            "string"
        ),
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("ja")),
        (F.pmod(F.xxhash64(doc_id, F.lit(7)), F.lit(4)) + 1).cast("int"),
    )

    op = (
        F.when(u_op < cfg.p_delete, F.lit("D"))
        # first sighting of a doc is semantically an insert; op tag is
        # informational (MERGE treats I and U identically = upsert)
        .when(u_op < 0.5, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    upsert_payload = F.when(
        u_extra < cfg.p_extra_key,
        F.to_json(
            F.struct(
                doc_id.alias("doc_id"),
                tokens.alias("tokens"),
                n_tok.alias("n_tok"),
                source.alias("source"),
                lang.alias("lang"),
            )
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                doc_id.alias("doc_id"),
                tokens.alias("tokens"),
                n_tok.alias("n_tok"),
                source.alias("source"),
            )
        )
    )
    delete_payload = F.to_json(F.struct(doc_id.alias("doc_id")))
    payload = F.when(op == "D", delete_payload).otherwise(upsert_payload)

    # deterministic corruption: malformed (truncate) and bad-typed tokens
    payload = F.when(
        u_bad < cfg.p_malformed,
        F.substring(payload, 1, 10),
    ).when(
        (u_bad >= cfg.p_malformed) & (u_bad < cfg.p_malformed + cfg.p_badtype),
        F.regexp_replace(payload, '"tokens":\\[[0-9,]*\\]', '"tokens":"oops"'),
    ).otherwise(payload)

    return df.select(
        F.col("log_offset"),
        (F.col("log_offset") / cfg.batch_size).cast("long").alias("epoch"),
        op.alias("op"),
        payload.alias("payload"),
    )


def write_changes(
    spark: SparkSession, cfg: ChangeGenConfig, path: str
) -> None:
    """Materialize the change log partitioned by epoch (partition-pruned
    per-epoch reads during replay)."""
    generate_changes(spark, cfg).write.mode("overwrite").partitionBy("epoch").parquet(
        path
    )
