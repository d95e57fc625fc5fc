"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: PII redaction, benchmark decontamination, domain-mixing
sampling, and token-budget sequence packing.

These extend the engine past the reference's operator set (the reference,
embulk-filter-expand_json, is a per-record JSON-expansion filter with no
corpus-level notion); they follow the same design contract as the rest of
the package:

- **Deterministic and oracle-replicable.** Every operator is reproducible
  bit-exactly by an ANSI-SQL oracle (DuckDB) so `__spark_entry__.py` can
  hash-verify it: md5-based bucketing (not xxhash64 — engine-portable),
  regex patterns valid under both Java regex and RE2, greedy packing with
  a pinned tie rule.
- **100 TB shape.** PII redaction and mixing are pure Catalyst projections
  (zero shuffle, whole-stage codegen). Decontamination broadcasts the
  benchmark's n-gram set (benchmarks are MB-scale; the corpus is the big
  side and is never shuffled — the only exchange is the distinct of the
  contaminated-id set, bounded by the corpus' true overlap). Packing is
  per-bucket sequential by construction (the only inherently serial scan),
  so parallelism = n_buckets and each group streams through one Arrow
  batch pipeline.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import word_ngrams
from .split import _GRID, split_bucket

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (kind, pattern, replacement) applied IN ORDER; order is part of the
#: contract (emails are redacted before digit-run rules so an address'
#: digits can't be half-eaten by the card-number rule). Patterns restrict
#: themselves to syntax with identical semantics in Java regex (Spark) and
#: RE2 (DuckDB/Go): no lookaround, no backreferences, classes + bounded
#: repetition + \b only.
DEFAULT_PII_RULES: Sequence[Tuple[str, str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?", "<PHONE>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    text: Column, rules: Sequence[Tuple[str, str, str]] = DEFAULT_PII_RULES
) -> Column:
    """Sequentially redact PII-shaped spans — pure Catalyst
    ``regexp_replace`` chain (JVM-side, zero shuffle; at 100 TB this rides
    the ingest scan for free). Returns the redacted text column."""
    out = text
    for _, pattern, repl in rules:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(
    text: Column, rules: Sequence[Tuple[str, str, str]] = DEFAULT_PII_RULES
) -> Sequence[Column]:
    """Per-kind match counts, measured on the SEQUENTIALLY redacted stream
    (kind k counts matches after rules 1..k-1 applied) so the counts sum to
    the number of replacements actually made — the audit metric a PII
    pipeline reports."""
    cols = []
    cur = text
    for kind, pattern, repl in rules:
        cols.append(F.regexp_count(cur, F.lit(pattern)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pattern, repl)
    return cols


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with the benchmark
    set (the standard eval-set decontamination rule, cf. GPT-3 appendix C /
    PaLM's 8-gram overlap; n is configurable because real pipelines tune
    it). Returns ``corpus`` + boolean ``contaminated``.

    Scale shape: the benchmark is MB-sized next to a TB corpus, so its
    distinct gram set is **broadcast** — the corpus side is never shuffled
    (explode is narrow, the semi-join is broadcast-hash). The only exchange
    is the distinct over contaminated ids, bounded by true overlap, and
    that id set is itself broadcast back for the flag join. Documents with
    fewer than ``n`` words contribute their whole text as a single gram
    (matching :func:`word_ngrams`), so short docs still decontaminate.
    """
    grams = word_ngrams(F.col(text_col), n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    hit_ids = (
        corpus.select(F.col(id_col), F.explode(grams).alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        corpus.join(F.broadcast(hit_ids), id_col, "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
    )


# ---------------------------------------------------------------------------
# Domain-mixing sample
# ---------------------------------------------------------------------------


def mix_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix42",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the domain-reweighting
    step of a data-mixture pipeline (keep 50% of web, 100% of books, ...).

    A document is kept iff its salted md5 bucket (same arithmetic as
    :func:`~..operators.split.hash_split`, so a doc's fate is independent
    of partitioning, cluster size, and engine) falls below its stratum's
    rate. Pure Catalyst projection + filter: zero shuffle, and the filter
    sits directly on the scan so Parquet row-group pruning on the stratum
    column still applies. Strata absent from ``rates`` get
    ``default_rate`` (drop by default — explicit mixtures only).
    """
    for name, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {name!r} not in [0,1]: {r}")
    bucket = split_bucket(F.col(id_col), salt)
    thresh = None
    for name, r in rates.items():
        lim = F.lit(int(round(r * _GRID)))
        thresh = (
            F.when(F.col(stratum_col) == name, lim)
            if thresh is None
            else thresh.when(F.col(stratum_col) == name, lim)
        )
    thresh = (
        thresh.otherwise(F.lit(int(round(default_rate * _GRID))))
        if thresh is not None
        else F.lit(int(round(default_rate * _GRID)))
    )
    return df.filter(bucket < thresh)


# ---------------------------------------------------------------------------
# Token-budget sequence packing
# ---------------------------------------------------------------------------


def select_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    score_col: str,
    id_col: str = "doc_id",
    resolution: int = 1000,
) -> DataFrame:
    """Keep the best-scoring documents until a global TOKEN budget is
    reached: rows ordered by ``(score DESC, id ASC)``, kept while the
    running token total (inclusive) stays ``<= budget`` — the data-mixing
    step that cuts a curated corpus down to a target training-token count.

    A naive implementation is one global window (ORDER BY score DESC) —
    a single-partition sort of the whole corpus. Instead this runs the
    distributed-prefix-sum shape: (1) one map-side-combined aggregate of
    token sums per score HISTOGRAM bucket (``floor(score * resolution)``,
    score clamped to [0,1]; <= resolution+1 rows to the driver), (2) the
    driver walks buckets best-first to find the boundary bucket where the
    cumulative crosses the budget, (3) buckets above the boundary are kept
    by a plain filter (no sort at all), and only the BOUNDARY bucket —
    ~1/resolution of the corpus — pays a windowed cumulative sum for the
    residual budget. Bucketing by the monotone floor preserves the global
    order exactly (equal scores share a bucket; the id tie-break happens
    inside the boundary window), so the result is bit-identical to the
    global-window semantics while the big data path is filter-only.

    Tokens are summed as BIGINT, so the budget comparison is exact; the
    boundary window is a single partition by construction and its size is
    bounded by the corpus mass in one score bucket (raise ``resolution``
    if scores concentrate).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")

    score = F.least(F.greatest(F.col(score_col), F.lit(0.0)), F.lit(1.0))
    bucket = F.floor(score * resolution).cast("long")
    work = df.withColumn("__b", bucket)
    hist = (
        work.groupBy("__b")
        .agg(F.sum(F.col(token_col).cast("long")).alias("toks"))
        .collect()
    )
    acc = 0
    boundary_b, residual = None, budget
    for row in sorted(hist, key=lambda r: -r["__b"]):
        if acc + row["toks"] > budget:
            boundary_b, residual = row["__b"], budget - acc
            break
        acc += row["toks"]
    if boundary_b is None:
        return df  # whole corpus fits the budget
    kept_full = work.filter(F.col("__b") > boundary_b).drop("__b")
    w = (
        Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_boundary = (
        work.filter(F.col("__b") == boundary_b)
        .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
        .filter(F.col("__cum") <= residual)
        .drop("__b", "__cum")
    )
    return kept_full.unionByName(kept_boundary)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 8,
    salt: str = "pack42",
) -> DataFrame:
    """Greedy sequential packing of documents into token-budgeted training
    sequences. Returns ``(bucket, <id_col>, <token_col>, seq_id)`` where
    ``seq_id`` numbers sequences within each bucket.

    Packing is an inherently serial scan (each doc's bin depends on the
    running fill — a data-dependent recurrence no window function
    expresses), so the corpus is first split into ``n_buckets``
    deterministic md5 buckets and each bucket packs independently: that is
    exactly how a production pipeline shards packing (per output shard),
    and it makes parallelism = n_buckets with one Arrow-batched
    ``applyInPandas`` group per bucket. Within a bucket docs pack in
    ``id_col`` order (pinned, so the oracle can replay it); a doc opens a
    new sequence when it would push the fill past ``budget`` and the
    current sequence is non-empty — an over-budget doc therefore occupies
    a sequence alone rather than being dropped (truncation is the
    tokenizer's job downstream).

    At 100 TB: raise n_buckets to O(cluster cores); the shuffle is one
    hash exchange on the bucket key, each group streams through pandas in
    arrival order after a per-group sort.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")

    bucket = (split_bucket(F.col(id_col), salt) % n_buckets).alias("bucket")
    slim = df.select(bucket, F.col(id_col), F.col(token_col))
    out_schema = (
        f"bucket long, {id_col} long, {token_col} long, seq_id long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq_ids = []
        seq = 0
        fill = 0
        for tok in pdf[token_col]:
            t = int(tok)
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            fill += t
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf

    return slim.groupBy("bucket").applyInPandas(pack, out_schema)


# ---------------------------------------------------------------------------
# boilerplate mining: corpus-level most-frequent n-grams
# ---------------------------------------------------------------------------

def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 10,
    by: str = "lang",
    text_col: str = "text",
    min_count: int = 2,
    salt_buckets: int = 64,
) -> DataFrame:
    """The k most frequent word n-grams per group — the C4/RefinedWeb
    boilerplate-mining diagnostic (what repeated phrases dominate a
    corpus slice before you write removal rules for them).

    Returns (``by``, gram, cnt, rank) with rank 1..k per group, ordered
    by (count desc, gram asc) so ties are deterministic and
    oracle-replicable.

    100 TB shape: explode -> ONE two-phase hash aggregate on
    (group, gram) (map-side combine absorbs each partition's repeats, and
    the composite key means a hot group does not serialize onto one
    reducer), then a SALTED TOURNAMENT for the top-k: a first window over
    (group, xxhash64(gram) % salt_buckets) keeps k rows per salt, a
    second window picks the global k from those salt_buckets*k finalists.
    Each gram lives in exactly one salt bucket, so the two-level result
    is exact — and no single task ever sees more than one salt bucket's
    gram counts, where the naive per-group window would pull a language's
    entire distinct-gram distribution (billions at corpus scale) into one
    partition. ``min_count`` pre-drops the singleton long tail before any
    window runs."""
    grams = df.select(
        F.col(by), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    counts = (
        grams.groupBy(by, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w1 = Window.partitionBy(
        by, F.pmod(F.xxhash64("gram"), F.lit(salt_buckets))
    ).orderBy(F.desc("cnt"), F.asc("gram"))
    finalists = (
        counts.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(by).orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        finalists.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(by, "gram", "cnt", "rank")
    )
