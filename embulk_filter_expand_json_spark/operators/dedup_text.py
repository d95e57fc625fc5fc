"""Document deduplication operators for training-data pipelines.

Four families, each shaped for 100 TB scale:

- **exact**: group by content fingerprint, keep the smallest doc_id. One
  hash-shuffle with map-side partial aggregation; no Python.
- **MinHash + LSH**: shingle -> K minhashes -> B bands -> explode bands ->
  self-join within (band, signature) buckets. The full pipeline is pure
  Catalyst (`char_ngrams` explode + codegen'd min aggregation), so the
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

import math
import re
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from embulk_filter_expand_json_spark.functions.fanout import (
    fan_out_small_scan as _fan_out_small_scan,
)
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
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ids: int = 100,
) -> DataFrame:
    """(fingerprint, n_dups, min_id, max_id, doc_ids) for groups with >1
    member. ``doc_ids`` is CAPPED at the ``max_ids`` smallest ids: a
    pathological duplicate group (billions of identical boilerplate docs in
    crawl data) must not materialize every id in one aggregation buffer.
    The rank filter happens BEFORE collect_list, so the agg buffer holds at
    most ``max_ids`` entries per group; full cardinality is in ``n_dups``,
    the extremes in min/max. The window and the groupBy share one hash
    exchange on ``fp`` (no second shuffle)."""
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(id_col)
    ranked = df.select(
        fingerprint(F.col(text_col)).alias("fp"), F.col(id_col)
    ).withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__rn") <= max_ids, F.col(id_col))
                )
            ).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup_against(
    new_df: DataFrame,
    corpus_df: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_fps: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental exact dedup: rows of a NEW batch that survive both
    within-batch exact dedup (min id per fingerprint) and an exact-match
    probe against an EXISTING corpus — the exact-dup step of
    continual-pretraining ingest, complementing
    :func:`minhash_dedup_against` for near-dups.

    The corpus participates only through its fingerprint column: pass
    ``corpus_fps`` (a persisted ``(doc_id, fp)``/``(fp)`` table maintained
    per accepted batch, e.g. in a SnapTable) and the corpus TEXT is never
    read. Scale shape: the NEW batch's distinct fingerprints broadcast to
    the corpus-fingerprint scan (BroadcastHashJoin — the corpus side
    streams, zero corpus shuffle, and parquet row groups prune on the fp
    min/max where the table is fp-sorted); the matched-fp set is
    batch-bounded and broadcasts back for the anti-join. No shuffle
    anywhere at corpus cardinality.
    """
    if corpus_fps is None:
        if corpus_df is None:
            raise ValueError("pass corpus_df or corpus_fps")
        corpus_fps = corpus_df.select(
            fingerprint(F.col(text_col)).alias("fp")
        )
    fp_name = "fp" if "fp" in corpus_fps.columns else corpus_fps.columns[-1]
    within = exact_dedup(new_df, text_col, id_col).withColumn(
        "__fp", fingerprint(F.col(text_col))
    )
    hits = (
        corpus_fps.select(F.col(fp_name).alias("__fp"))
        .join(F.broadcast(within.select("__fp").distinct()), on="__fp")
        .distinct()
    )
    return within.join(
        F.broadcast(hits), on="__fp", how="left_anti"
    ).drop("__fp")


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
    min over xxhash64(shingle, seed_i) per hash function.

    Physical shape: explode shingles -> hash-aggregate with num_hashes
    ``min`` buffers (whole-stage codegen). Re-measured this round: the
    per-hash ``transform``/``array_min`` HOF projection computes identical
    values with zero shuffle but runs interpreted — min-of-5 ABBA at bench
    scale put it at 4.2 s vs 2.1 s for this shape — so the codegen'd
    explode+agg stays (the groupBy's exchange is one ~8*num_hashes-byte
    row per doc after map-side partial aggregation, negligible next to
    the hashing itself)."""
    # project to (id, text) BEFORE the fan-out so only needed bytes move,
    # then spread an undersized scan across the cores: the shingle explode
    # and the K min-hash buffers are the map side of the groupBy below and
    # otherwise run at input-split parallelism (1 task on a 1-row-group
    # corpus file — measured 6.9 s of a 12 s run at bench scale)
    src = _fan_out_small_scan(df.select(F.col(id_col), F.col(text_col)))
    shingles = F.array_distinct(char_ngrams(F.col(text_col), shingle_size))
    exploded = (
        src.select(F.col(id_col), shingles.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .select(id_col, F.explode("__sh").alias("__s"))
    )
    aggs = [
        F.min(F.xxhash64("__s", F.lit(seed + i))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(
                *[F.col(f"__h{i}") for i in range(num_hashes)]
            ).alias("minhash"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) colliding in >=1 LSH band.

    The band rows carry ONLY (band, band_hash, id) — never the minhash
    array. At 64 longs (~512 B) exploded into 16 bands on both join sides,
    carrying signatures through the shuffle inflates it ~16x for data the
    candidate stage never reads; estimation/verification joins signatures
    back on the (tiny) candidate set instead."""
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, seed
    )
    # materialize signatures before banding: the band projection references
    # minhash[i] once per hash, and Catalyst's projection collapse would
    # inline the 64-fold min-hash computation into EVERY reference
    # (measured 3x the signature cost). n_docs x 64 longs — tiny.
    sigs = sigs.localCheckpoint(eager=True)
    return _candidates_from_sigs(sigs, id_col, num_hashes, bands)


def _band_table(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bh) rows — bh is the xxhash64 of the band's signature
    slice, so band rows are 24 B regardless of signature length."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        F.col(id_col),
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
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


def _candidates_from_sigs(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    banded = _band_table(sigs, id_col, num_hashes, bands)

    # NO checkpoint here: every caller passes a localCheckpoint'ed `sigs`,
    # so each self-join side recomputes only the cheap band projection over
    # in-memory signature blocks — the shingle+signature pipeline behind
    # them never re-runs. Materializing the band table itself (n_docs x
    # bands rows) would cost an extra eager job at bench scale and real
    # memory at corpus scale for no avoided work.
    left = banded.select("band", "bh", F.col(id_col).alias("id_a"))
    right = banded.select("band", "bh", F.col(id_col).alias("id_b"))
    return (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
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
    verify: str = "exact",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with similarity >= threshold.

    ``verify='exact'`` (default): LSH candidates verified by EXACT shingle
    Jaccard — column ``jaccard``. The expensive exact measure touches only
    the candidate set, so this is both more precise than the MinHash
    estimate and deterministic/SQL-oracle-comparable.
    ``verify='estimate'``: the unbiased MinHash estimator — column
    ``est_jaccard`` — computed by re-joining signatures once on the
    candidate ids (signatures still never ride the band shuffle).

    Before the exact verify, candidates pass a MinHash-ESTIMATE prefilter
    at ``threshold - 0.45``: a loose band config (16x4 here, chosen for
    ~100% recall at J>=0.8) admits ~1000x more false candidates than true
    pairs, and each exact verification shuffles two full shingle arrays.
    The margin makes the prefilter sound for practical purposes: a true
    pair at J>=threshold fails it with probability
    exp(-2*num_hashes*0.45^2) ~= 5e-12 at 64 hashes (Hoeffding), while
    J~0.2 noise pairs are ~94% eliminated (measured 240k -> ~15k verify
    load at sf0.1, 2.9x end-to-end)."""
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, seed
    ).localCheckpoint(eager=True)
    cand = _candidates_from_sigs(sigs, id_col, num_hashes, bands)

    def _estimated(pairs: DataFrame) -> DataFrame:
        a = sigs.select(
            F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")
        )
        b = sigs.select(
            F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")
        )
        scored = pairs.join(a, "id_a").join(b, "id_b")
        agree = F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
                lambda x: x,
            )
        )
        est = agree.cast("double") / F.lit(float(num_hashes))
        return scored.select(
            "id_a", "id_b", F.round(est, 6).alias("est_jaccard")
        )

    if verify == "exact":
        # Estimate-based prefilter before the expensive shingle-array join.
        # The margin must scale with the signature length: a true pair at
        # exact Jaccard >= threshold fails `estimate >= threshold - m` with
        # probability <= exp(-2 * num_hashes * m^2) (Hoeffding). The fixed
        # 0.45 margin is only safe at >= 64 hashes (5e-12); at num_hashes=8
        # it would silently drop ~4% of true pairs. Pick the smallest
        # margin keeping the false-drop bound <= 1e-9 — for short
        # signatures the margin exceeds the threshold and the prefilter
        # disables itself (correctness over speed).
        margin = max(0.45, math.sqrt(math.log(1e9) / (2.0 * num_hashes)))
        prefilter = threshold - margin
        if prefilter > 0:
            cand = (
                _estimated(cand)
                .filter(F.col("est_jaccard") >= prefilter)
                .select("id_a", "id_b")
            )
        return ngram_jaccard_pairs(
            df, cand, text_col, id_col, shingle_size, threshold
        )
    if verify != "estimate":
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    return _estimated(cand).filter(F.col("est_jaccard") >= threshold)


# ------------------------------------------------------- exact n-gram Jaccard

def remove_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4/RefinedWeb line rule): a
    LINE whose trimmed form appears in >= ``min_docs`` DISTINCT documents
    is removed from EVERY document; surviving lines keep their order.
    Navigation chrome, cookie banners, and signature blocks repeat across
    pages while real prose does not — this is the standard web-curation
    pass after document-level dedup.

    Scale shape: posexplode -> one hash-shuffle groupBy over the line text
    for distinct-doc counts (map-side partial aggregation; cost ~ corpus
    lines, the same order as exact dedup), an anti-join of lines against
    the (small) over-threshold line set, and a per-doc
    sort-and-reassemble. Documents whose every line is boilerplate
    survive with empty text (rows are never dropped — that is
    quality-filtering's job, not dedup's)."""
    # F.split takes a REGEX while array_join below takes a LITERAL: escape
    # the separator so e.g. sep="." or "|" splits on the literal character
    # and round-trips through reassembly unchanged
    lines = _fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "__pos", "__line"
        ),
    ).withColumn("__norm", F.trim(F.col("__line")))
    dup = (
        lines.filter(F.col("__norm") != "")
        .groupBy("__norm")
        .agg(F.count_distinct(F.col(id_col)).alias("__n"))
        .filter(F.col("__n") >= min_docs)
        .select("__norm")
    )
    kept = lines.join(dup, on="__norm", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        df.drop(text_col)
        .join(rebuilt, on=id_col, how="left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )


def dedup_keep_best(
    df: DataFrame,
    components: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE representative per near-dup component: the member with the
    HIGHEST ``score_col`` (ties -> lowest id). Documents not in any
    component pass through untouched. This is the dedup action real
    curation pipelines run — when near-identical documents cluster, keep
    the highest-quality copy, not an arbitrary (min-id) one.

    Scale shape: the window runs over the COMPONENT list (the clustered
    docs only — orders of magnitude smaller than the corpus), scores join
    onto it by id, and the corpus pays one anti-join against the non-
    representative ids. No corpus-sized shuffle.
    """
    from pyspark.sql import Window

    scored = components.join(
        df.select(F.col(id_col), F.col(score_col)), on=id_col
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.col(id_col)
    )
    reps = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col)
    )
    non_reps = components.select(id_col).join(
        reps, on=id_col, how="left_anti"
    )
    return df.join(non_reps, on=id_col, how="left_anti")


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair list -> (doc_id,
    component) with component = the minimum doc id reachable. This is the
    step that turns pairwise near-dup detection into actionable dedup:
    keep each component's minimum (the representative), drop the rest —
    without it, chains (A~B, B~C, A!~C) leave duplicates behind.

    Iterative min-label propagation with pointer jumping: each round every
    node takes min(own label, neighbors' labels), then replaces its label
    with *its label's* label (path halving). The jump step turns
    diameter-d chains into O(log d) rounds — the same doubling idea as
    large-star/small-star — so ``max_iter`` = 25 covers any graph up to
    diameter ~2^25. If the loop still exhausts ``max_iter`` with changes
    pending, a RuntimeError is raised rather than returning silently
    under-merged components (no silent caps).
    Each round is two joins + one groupBy over the EDGE list (tiny: the
    verified near-dup pairs, not the corpus); labels are
    localCheckpoint'ed per round to keep the plan from growing. The
    driver-side loop with a convergence count is the standard Spark shape
    for iterative graph algorithms (GraphFrames' connectedComponents does
    the same large-star/small-star looping).
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    )
    edges = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        neighbor = (
            edges.join(
                labels.withColumnRenamed("node", "dst"), on="dst"
            )
            .select(F.col("src").alias("node"), "label")
        )
        propagated = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump (path halving): label <- label[label]. Labels are
        # always node ids present in `labels`, so the self-join hits; the
        # coalesce is belt-and-braces. This is what makes long chains
        # converge in O(log d) rounds instead of O(d).
        jump = propagated.select(
            F.col("node").alias("__l"), F.col("label").alias("__ll")
        )
        new_labels = (
            propagated.join(
                jump, on=propagated["label"] == jump["__l"], how="left"
            )
            .select(
                "node",
                F.coalesce("__ll", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"neardup_components did not converge after {max_iter} rounds "
            f"({changed} labels still changing); the pair graph is deeper "
            f"than 2^{max_iter} hops or max_iter was set too low — raise "
            f"max_iter rather than using under-merged components"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def ngram_jaccard_all_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard near-dup detection (no probabilistic
    recall gap, unlike MinHash/SimHash) — the fourth dedup family of the
    task brief as a standalone operator.

    Scale strategy: Jaccard(A,B) >= t forces min(|A|,|B|) >= t*max(|A|,|B|),
    so shingle-set SIZES must land within one log_{1/t} band of each other.
    Each doc emits its (id, size) — ids only, no shingle arrays through the
    shuffle — at bands {b, b+1}; a band equi-join + the exact size-ratio
    predicate yields the candidate pairs, and the full shingle sets are
    re-joined once on that (small) candidate set for the exact verify
    (ngram_jaccard_pairs). This replaces the cartesian with a keyed join;
    within a band it is still quadratic in the band's population, so at the
    100 TB regime minhash_lsh_pairs(verify='exact') is the scale path and
    this operator is the exact small/medium-corpus path (and the oracle of
    record for the probabilistic ones)."""
    import math

    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    sizes = _fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.size(
            F.array_distinct(char_ngrams(F.col(text_col), shingle_size))
        ).alias("n"),
    )
    band = F.floor(
        F.log(F.col("n").cast("double")) / F.lit(math.log(1.0 / threshold))
    )
    emit = sizes.select(
        "id", "n", F.explode(F.array(band, band + 1)).alias("jb")
    )
    # materialize before the self-join: both sides are independent plan
    # branches and would each re-shingle the corpus just to count sizes
    emit = emit.localCheckpoint(eager=True)
    a, b = emit.alias("a"), emit.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.jb") == F.col("b.jb"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.n"), F.col("b.n"))
                >= F.lit(threshold) * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # a pair can share both emitted bands
    )
    return ngram_jaccard_pairs(
        df,
        cand,
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        threshold=threshold,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard, computed only for candidate (id_a, id_b)
    pairs (broadcast-joined shingle sets when small).

    Shingles are computed ONLY for documents appearing in the candidate
    set (semi-join first), then materialized once: the two join sides
    (id_a / id_b) would otherwise each re-shingle, and at corpus scale the
    candidate set is orders of magnitude smaller than the corpus."""
    cand = candidates.select("id_a", "id_b").localCheckpoint(eager=True)
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        _fan_out_small_scan(
            df.join(F.broadcast(cand_ids), on=id_col, how="left_semi")
            .select(id_col, text_col)
        )
        .select(
            F.col(id_col),
            F.array_distinct(
                char_ngrams(F.col(text_col), shingle_size)
            ).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
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
    """64-bit SimHash: per token, a 64-bit hash votes +1/-1 per bit; the
    signature is the sign vector.

    Token hashing runs in Catalyst (``transform(split(lower(text)), t ->
    xxhash64(t, seed))`` — whole-stage codegen, zero per-token Python);
    only the bit-voting reduction crosses into an Arrow-batched numpy
    kernel, which processes token-hash arrays in budgeted sub-batches with
    a column-wise popcount cumsum (no per-token interpreter work)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    hashed = _fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed))).alias("__th"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        TOK_BUDGET = 1 << 18  # bit-matrix working set ~16 MB per sub-batch
        for pdf in batches:
            n = len(pdf)
            th = pdf["__th"]
            lens = np.fromiter(
                (0 if a is None else len(a) for a in th),
                dtype=np.int64,
                count=n,
            )
            out = np.zeros(n, dtype=np.uint64)
            start = 0
            while start < n:
                end, tot = start, 0
                while end < n and (tot == 0 or tot + lens[end] <= TOK_BUDGET):
                    tot += int(lens[end])
                    end += 1
                if tot:
                    flat = np.concatenate(
                        [
                            np.asarray(th.iloc[i], dtype=np.int64)
                            for i in range(start, end)
                            if lens[i]
                        ]
                    ).view(np.uint64)
                    bits = ((flat[:, None] >> bit_idx) & np.uint64(1)).astype(
                        np.uint8
                    )
                    csum = np.zeros((tot + 1, 64), dtype=np.int64)
                    np.cumsum(bits, axis=0, out=csum[1:])
                    offs = np.zeros(end - start + 1, dtype=np.int64)
                    np.cumsum(lens[start:end], out=offs[1:])
                    sums = csum[offs[1:]] - csum[offs[:-1]]  # (rows, 64)
                    votes = 2 * sums - lens[start:end, None]
                    out[start:end] = (
                        (votes > 0).astype(np.uint64) << bit_idx
                    ).sum(axis=1, dtype=np.uint64)
                start = end
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": out.view(np.int64)}
            )

    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    return hashed.mapInPandas(
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
    # materialize before the self-join: the two sides are independent plan
    # branches, and re-running this one means re-running the whole Arrow
    # bit-voting kernel over the corpus. (id, simhash, 4 chunk keys) rows.
    chunks = chunks.localCheckpoint(eager=True)
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


# --------------------------------------------- exact duplicate substrings

def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 15,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicate-substring detection, the token-window formulation of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): every ``window``-token sliding window whose text occurs
    >= ``min_count`` times in the corpus (within- OR cross-document —
    memorization does not care which) marks its token range as duplicated;
    overlapping/adjacent marked windows merge into maximal spans.

    Returns ``(id_col, span_start, span_end, span_tokens)`` — 0-based
    inclusive token positions in the normalized (lower/trim, whitespace-
    split) token stream, one row per maximal span.

    Scale shape: windows are md5-hashed BEFORE the shuffle, so the
    count-and-filter aggregation and the semi-join move 32-char digests
    rather than ~100-char window texts; the duplicated-gram set is
    boilerplate-sized (small), so AQE can broadcast the semi-join side;
    the island merge is one window-function pass partitioned by document.
    Docs shorter than ``window`` tokens have no windows — they cannot
    memorize-duplicate at this granularity (Lee et al.'s contract).
    """
    from pyspark.sql import Window as W

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = _fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col), words.alias("__ws")
    ).filter(F.size("__ws") >= window)
    wins = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__ws") - window),
                lambda i: F.md5(
                    F.array_join(F.slice("__ws", i + 1, window), " ")
                ),
            )
        ).alias("__pos", "__g"),
    )
    dup = (
        wins.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__g")
    )
    occ = wins.join(dup, "__g", "left_semi").select(id_col, "__pos")
    w_doc = W.partitionBy(id_col).orderBy("__pos")
    flagged = occ.withColumn(
        "__new",
        F.when(
            F.col("__pos") > F.lag("__pos").over(w_doc) + window, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(w_doc.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(id_col, "__island")
        .agg(
            F.min("__pos").cast("long").alias("span_start"),
            (F.max("__pos") + window - 1).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 15,
    min_count: int = 2,
) -> DataFrame:
    """Remove every duplicated span found by :func:`duplicate_spans` from
    every document (Lee et al.'s dedup action: cut the repeated substring
    everywhere, keep the surrounding prose). Operates in normalized token
    space — the returned ``text_col`` is the surviving tokens re-joined
    with single spaces (token-level dedup's standard output; the original
    byte text is gone the moment windows are tokenized). Rows are never
    dropped: a fully-duplicated document survives with empty text.

    Scale shape: the span table is small (boilerplate-sized); the
    token-vs-span anti-join is equi on the document id with a range
    residual, then one groupBy per document to reassemble — both
    exchanges hash on the id, so AQE coalesces them onto one key layout.
    """
    spans = duplicate_spans(df, text_col, id_col, window, min_count)
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = df.select(
        F.col(id_col), F.posexplode(words).alias("__pos", "__w")
    )
    kept = toks.alias("t").join(
        spans.alias("s"),
        on=[
            F.col(f"t.{id_col}") == F.col(f"s.{id_col}"),
            F.col("t.__pos") >= F.col("s.span_start"),
            F.col("t.__pos") <= F.col("s.span_end"),
        ],
        how="left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__w"))),
                lambda s: s["__w"],
            ),
            " ",
        ).alias(text_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .fillna({text_col: ""})
    )


# ------------------------------------------- incremental corpus dedup

def minhash_dedup_against(
    new_df: DataFrame,
    corpus_df: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    corpus_sigs: Optional[DataFrame] = None,
    verify: str = "exact",
) -> DataFrame:
    """Incremental near-dup probe: pairs ``(id_new, id_corpus[, jaccard |
    est_jaccard])`` between a NEW document batch and an EXISTING corpus —
    the dedup step of continual-pretraining ingest, where each arriving
    batch must be checked against everything already accepted without
    re-deduplicating the corpus.

    The corpus side participates only through its (persisted) signature
    table: pass ``corpus_sigs`` (a table produced by
    :func:`minhash_signatures`, e.g. maintained in a SnapTable keyed by
    doc id and appended per accepted batch) and the 100 TB corpus TEXT is
    never read — band rows are built from signatures alone, and the band
    join is new-batch-sized on one side. ``verify='estimate'`` keeps it
    that way (the MinHash estimator runs on the stored signatures);
    ``verify='exact'`` re-reads text for the candidate ids only (needs
    ``corpus_df``) and is the deterministic/SQL-oracle-comparable mode.
    Ids must be globally unique across both tables (they share the doc-id
    namespace by construction in an ingest pipeline).

    Unlike the self-join of :func:`minhash_lsh_pairs` there is no
    corpus-vs-corpus quadratic term at all: candidates are (new x corpus)
    band collisions only.
    """
    if corpus_sigs is None:
        if corpus_df is None:
            raise ValueError("pass corpus_df or corpus_sigs")
        corpus_sigs = minhash_signatures(
            corpus_df, text_col, id_col, num_hashes, shingle_size, seed
        )
    corpus_sigs = corpus_sigs.localCheckpoint(eager=True)
    new_sigs = minhash_signatures(
        new_df, text_col, id_col, num_hashes, shingle_size, seed
    ).localCheckpoint(eager=True)

    banded_new = _band_table(new_sigs, id_col, num_hashes, bands).select(
        "band", "bh", F.col(id_col).alias("id_new")
    )
    banded_cor = _band_table(corpus_sigs, id_col, num_hashes, bands).select(
        "band", "bh", F.col(id_col).alias("id_corpus")
    )
    cand = (
        banded_new.join(banded_cor, on=["band", "bh"])
        .select("id_new", "id_corpus")
        .distinct()
    )

    def _estimated(pairs: DataFrame) -> DataFrame:
        a = new_sigs.select(
            F.col(id_col).alias("id_new"), F.col("minhash").alias("mh_a")
        )
        b = corpus_sigs.select(
            F.col(id_col).alias("id_corpus"), F.col("minhash").alias("mh_b")
        )
        agree = F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda x: x
            )
        )
        return (
            pairs.join(a, "id_new")
            .join(b, "id_corpus")
            .select(
                "id_new",
                "id_corpus",
                F.round(
                    agree.cast("double") / F.lit(float(num_hashes)), 6
                ).alias("est_jaccard"),
            )
        )

    if verify == "estimate":
        return _estimated(cand).filter(F.col("est_jaccard") >= threshold)
    if verify != "exact":
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    if corpus_df is None:
        raise ValueError("verify='exact' needs corpus_df (candidate texts)")
    # same Hoeffding-sound estimate prefilter as minhash_lsh_pairs
    margin = max(0.45, math.sqrt(math.log(1e9) / (2.0 * num_hashes)))
    prefilter = threshold - margin
    if prefilter > 0:
        cand = (
            _estimated(cand)
            .filter(F.col("est_jaccard") >= prefilter)
            .select("id_new", "id_corpus")
        )
    union = new_df.select(id_col, text_col).unionByName(
        corpus_df.select(id_col, text_col)
    )
    verified = ngram_jaccard_pairs(
        union,
        cand.select(
            F.col("id_new").alias("id_a"), F.col("id_corpus").alias("id_b")
        ),
        text_col,
        id_col,
        shingle_size,
        threshold,
    )
    return verified.select(
        F.col("id_a").alias("id_new"),
        F.col("id_b").alias("id_corpus"),
        "jaccard",
    )
