"""Training-data operator tests: text functions, dedup family, similarity
search — planted-duplicate fixtures plus numpy cross-checks."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.functions import text as TX
from embulk_filter_expand_json_spark.operators.dedup_text import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from embulk_filter_expand_json_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dup of 0
    (3, "completely different content about database query optimization engines"),
    (4, "The Quick Brown Fox... jumps over the lazy dog and runs away fast!"),  # norm dup of 0
    (5, "der hund und die katze sind nicht das problem"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("hi, there!",)], "t string")
    rows = df.select(
        TX.whitespace_token_count(F.col("t")).alias("ws"),
        TX.bpe_ish_token_count(F.col("t")).alias("bpe"),
    ).collect()
    assert [r["ws"] for r in rows] == [3, 0, 2]
    assert [r["bpe"] for r in rows] == [3, 0, 4]  # hi , there !


def test_quality_score_bounds_and_ordering(docs_df):
    rows = docs_df.select("doc_id", TX.quality_score(F.col("text")).alias("q")).collect()
    scores = {r["doc_id"]: r["q"] for r in rows}
    assert all(0.0 <= s <= 1.0 for s in scores.values())
    # English prose with stopwords beats punctuation-heavy variant
    assert scores[0] >= scores[4]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house went to sleep in peace",),
            ("der hund und die katze sind nicht froh das haus",),
            ("le chat et la maison des gens dans les rues",),
            ("xyzzy plugh qwerty",),
        ],
        "t string",
    )
    rows = df.select(TX.lang_id(F.col("t")).alias("l")).collect()
    assert [r["l"] for r in rows] == ["en", "de", "fr", "und"]


def test_fingerprint_normalization(docs_df):
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs_df.select(
            "doc_id", TX.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[0] == fps[1] == fps[4]  # case/punct-insensitive
    assert fps[0] != fps[2]
    assert fps[0] != fps[3]


def test_char_ngrams(spark):
    row = spark.createDataFrame([("abcdef",)], "t string").select(
        TX.char_ngrams(F.col("t"), 3).alias("g")
    ).collect()[0]
    assert row["g"] == ["abc", "bcd", "cde", "def"]


def test_exact_dedup(docs_df):
    kept = exact_dedup(docs_df).collect()
    kept_ids = sorted(r["doc_id"] for r in kept)
    assert kept_ids == [0, 2, 3, 5]  # 1 and 4 are dups of 0 (min id kept)
    groups = exact_dup_groups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1, 4]


def test_minhash_lsh_finds_near_dups(docs_df):
    # default: exact-verified pairs (LSH candidates -> exact shingle Jaccard)
    pairs = minhash_lsh_pairs(
        docs_df, num_hashes=64, bands=16, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found  # exact dup -> jaccard 1.0
    assert (0, 2) in found  # one-word change -> high jaccard
    assert all(3 not in p and 5 not in p for p in found)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert jac[(0, 2)] >= 0.5
    # estimate mode: the MinHash estimator, signatures re-joined on the
    # candidate set only
    est_pairs = minhash_lsh_pairs(
        docs_df, num_hashes=64, bands=16, threshold=0.5, verify="estimate"
    ).collect()
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in est_pairs}
    assert est[(0, 1)] == 1.0
    assert est[(0, 2)] >= 0.5


def test_ngram_jaccard_verify(docs_df, spark):
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, cand, threshold=0.0).collect()
    }
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(0, 3)] < 0.1


def test_ngram_jaccard_all_pairs_complete_vs_bruteforce(spark):
    """The size-band candidate join must lose NO pair a brute-force
    cartesian finds — exactness is this operator's whole point."""
    import itertools
    import random

    from embulk_filter_expand_json_spark.operators.dedup_text import (
        ngram_jaccard_all_pairs,
    )

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(40):
        n = rng.randrange(3, 30)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    # guaranteed near-dups of assorted lengths
    rows += [(100 + i, rows[i][1] + " zz") for i in range(0, 40, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(t):
        norm = " ".join(t.lower().split())
        return (
            {norm}
            if len(norm) < 5
            else {norm[i : i + 5] for i in range(len(norm) - 4)}
        )

    sh = {i: shingles(t) for i, t in rows}
    want = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j >= 0.8:
            want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_all_pairs(df, threshold=0.8).collect()
    }
    assert got == want and len(want) >= 6


def test_neardup_components_vs_union_find(spark):
    """Transitive chains (A~B, B~C, A!~C) must cluster together — compare
    against a plain union-find over the same edges, including a length-11
    chain that needs ~10 propagation rounds."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        neardup_components,
    )

    pairs = (
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
        + [(100 + i, 101 + i) for i in range(10)]  # chain 100..110
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in neardup_components(df).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
    assert got[110] == 100 and got[3] == 1  # chain + triangle collapsed


def test_neardup_components_deep_chain_converges(spark):
    """A diameter-60 chain exceeds the old one-hop-per-round budget of 25
    — pointer jumping must converge it in O(log d) rounds (r3 verdict #2:
    silent under-merge on deep chains)."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        neardup_components,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in neardup_components(df).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_neardup_components_raises_on_non_convergence(spark):
    """Exhausting max_iter with labels still moving must raise, never
    return under-merged components."""
    import pytest as _pytest

    from embulk_filter_expand_json_spark.operators.dedup_text import (
        neardup_components,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(df, max_iter=2)


def test_simhash_near_dups(docs_df):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs_df).collect()}
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    # short docs are noisy: one changed word of 13 flips a handful of bits
    # (5 with the xxhash64 token hash), far from unrelated docs (~32)
    pairs = simhash_near_dup_pairs(docs_df, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 1)] == 0
    assert found[(0, 2)] == 5
    assert (0, 3) not in found


# ------------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_cosine_topk_matches_numpy(emb_df):
    rows = emb_df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(cos, 6)))
    want = list(ids[order][:10])
    got = [r["vec_id"] for r in cosine_topk(emb_df, list(q), k=10).collect()]
    assert got == want
    assert got[0] == 0  # query vector itself


def test_lsh_topk_recall(emb_df):
    # the synthetic embeddings are near-random (best non-self cosine ~0.33),
    # the worst case for LSH — true neighbors are barely more co-hashed than
    # anyone else. The contract here: the strong-signal match (the query
    # vector itself, cosine 1.0) is ALWAYS found, and recall stays above the
    # measured deterministic floor for this data/seed.
    rows = emb_df.limit(1).collect()
    q = list(rows[0]["embedding"])
    exact = {r["vec_id"] for r in cosine_topk(emb_df, q, k=10).collect()}
    approx_rows = lsh_topk(emb_df, q, k=10, n_bits=4, n_probes=8).collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert approx_rows[0]["vec_id"] == 0 and approx_rows[0]["cosine"] == 1.0
    recall = len(exact & approx) / 10
    assert recall >= 0.3


def test_embedding_near_dup_pairs(spark, emb_df):
    # plant an exact duplicate vector with a new id
    dup = emb_df.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    df = emb_df.unionByName(dup)
    dim = len(emb_df.first()["embedding"])
    pairs = embedding_near_dup_pairs(df, dim=dim, threshold=0.999).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1_000_000) in found


def test_lsh_index_lifecycle(spark, emb_df, tmp_path):
    """build_lsh_index writes sig-partitioned storage; lsh_index_topk probes
    it as a partition-pruned scan and agrees with the on-the-fly lsh_topk."""
    from embulk_filter_expand_json_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
        lsh_topk,
        read_lsh_index,
    )

    path = str(tmp_path / "ann_index")
    dim = len(emb_df.first()["embedding"])
    build_lsh_index(emb_df, dim=dim, path=path, n_bits=4)
    q = list(emb_df.limit(1).collect()[0]["embedding"])

    # plan gate: the probe scan must be partition-pruned on sig
    probe = read_lsh_index(spark, path, q, n_bits=4, n_probes=8)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "sig" in plan.split("PartitionFilters")[1][:160]

    got = lsh_index_topk(spark, path, q, k=10, n_bits=4, n_probes=8).collect()
    fly = lsh_topk(emb_df, q, k=10, n_bits=4, n_probes=8).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in fly
    ]
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == 1.0


def test_hash_split_deterministic_stable_proportioned(spark):
    from pyspark.sql import functions as F

    from embulk_filter_expand_json_spark.operators.split import hash_split

    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    out = hash_split(df)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # zero shuffle: pure projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # stability under appends: the first 1000 ids keep their labels when
    # the table is 20x larger
    small = {r["doc_id"]: r["split"] for r in
             hash_split(spark.range(1000).select(F.col("id").alias("doc_id"))).collect()}
    big = {r["doc_id"]: r["split"] for r in
           out.filter(F.col("doc_id") < 1000).collect()}
    assert small == big
    # different salt -> different assignment (not degenerate)
    other = {r["doc_id"]: r["split"] for r in
             hash_split(df.filter(F.col("doc_id") < 1000), salt="other").collect()}
    assert other != small
    # custom weights normalize and cover everything
    w = hash_split(df, weights={"a": 2, "b": 2}, salt="s2")
    cw = {r["split"]: r["n"] for r in
          w.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(cw) == {"a", "b"} and sum(cw.values()) == 20_000


def test_repetition_metrics(spark):
    from embulk_filter_expand_json_spark.functions.text import (
        repetition_metrics,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam spam spam"),
            (3, "one two three one two three"),  # doubled text
            (4, "word"),
        ],
        "doc_id long, text string",
    )
    cols = repetition_metrics(F.col("text"))
    out = {r["doc_id"]: r for r in df.select("doc_id", *cols).collect()}
    assert out[1]["type_token_ratio"] == round(8 / 9, 6)
    assert out[1]["dup_2gram_frac"] == 0.0
    # 'spam'x6: 5 bigrams all equal -> 1 - 1/5
    assert out[2]["type_token_ratio"] == round(1 / 6, 6)
    assert out[2]["dup_2gram_frac"] == 0.8
    # doubled text: bigrams 5, distinct 3 ('three one' bridges the copies)
    assert out[3]["dup_2gram_frac"] == 0.4
    assert out[3]["type_token_ratio"] == 0.5
    # single word: no n-grams -> 0.0 by definition, not an error
    assert out[4]["dup_2gram_frac"] == 0.0 and out[4]["dup_3gram_frac"] == 0.0


def test_dedup_keep_best(spark):
    """Quality-weighted representative selection: highest score wins, ties
    break to the lowest id, unclustered docs pass through."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [
            (1, 0.5), (2, 0.9), (3, 0.9),   # component 1: 2 and 3 tie -> 2
            (10, 0.7), (11, 0.3),           # component 10: 10 wins
            (99, 0.1),                      # unclustered: passes through
        ],
        "doc_id long, q double",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component long",
    )
    got = {
        r["doc_id"]
        for r in dedup_keep_best(docs, comps, score_col="q").collect()
    }
    assert got == {2, 10, 99}


def test_remove_duplicate_lines(spark):
    """Line repeated across >= min_docs docs vanishes everywhere; unique
    and intra-doc-repeated lines survive in order; all-boilerplate docs
    keep their row with empty text."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        remove_duplicate_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "real prose one\nAD: subscribe\nmore prose"),
            (2, "different text\nAD: subscribe"),
            (3, "AD: subscribe"),                     # all boilerplate
            (4, "self\nself\nunique tail"),           # intra-doc repeat only
            (5, "  AD: subscribe  \nkept line"),      # trim-normalized match
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(docs, min_docs=2).collect()
    }
    assert got[1] == "real prose one\nmore prose"
    assert got[2] == "different text"
    assert got[3] == ""
    assert got[4] == "self\nself\nunique tail"  # 1 doc < min_docs
    assert got[5] == "kept line"
    assert set(got) == {1, 2, 3, 4, 5}  # no rows dropped


def test_minhash_dedup_against(spark, docs_df):
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_dedup_against,
        minhash_signatures,
    )

    new = spark.createDataFrame(
        [
            (100, DOCS[0][1] + " zzz"),  # near-dup of docs 0/1 (exact twins)
            (101, "totally unrelated new content about orchestration of containers"),
        ],
        "doc_id long, text string",
    )
    got = minhash_dedup_against(new, docs_df, threshold=0.8).collect()
    pairs = {(r["id_new"], r["id_corpus"]) for r in got}
    assert (100, 0) in pairs and (100, 1) in pairs
    assert all(p[0] in (100, 101) for p in pairs)  # never corpus-vs-corpus
    assert not any(p[0] == 101 for p in pairs)
    for r in got:
        assert r["jaccard"] >= 0.8

    # estimate mode from a persisted signature table only — corpus text
    # never touched (corpus_df omitted entirely)
    sigs = minhash_signatures(docs_df)
    est = minhash_dedup_against(
        new, corpus_sigs=sigs, threshold=0.8, verify="estimate"
    ).collect()
    est_pairs = {(r["id_new"], r["id_corpus"]) for r in est}
    assert (100, 0) in est_pairs and (100, 1) in est_pairs
    assert not any(p[0] == 101 for p in est_pairs)

    # exact mode without corpus text is a configuration error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="corpus_df"):
        minhash_dedup_against(new, corpus_sigs=sigs, verify="exact")


def test_exact_dedup_against(spark, docs_df):
    from embulk_filter_expand_json_spark.functions.text import fingerprint
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        exact_dedup_against,
    )

    new = spark.createDataFrame(
        [
            (100, DOCS[0][1]),             # verbatim corpus clone -> drops
            (101, DOCS[0][1] + " zzz"),    # variant: new fp -> survives
            (102, "fresh новый content"),  # fresh, planted twice
            (103, "fresh новый content"),  # within-batch dup -> drops
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in exact_dedup_against(new, docs_df).collect()
    )
    assert got == [101, 102]

    # persisted-fingerprint-table mode: corpus text never read
    fps = docs_df.select(fingerprint(F.col("text")).alias("fp"))
    got2 = sorted(
        r["doc_id"]
        for r in exact_dedup_against(new, corpus_fps=fps).collect()
    )
    assert got2 == [101, 102]

    # scale shape: both joins against the corpus-sized side broadcast the
    # batch-bounded side — no shuffle at corpus cardinality
    plan = exact_dedup_against(
        new, corpus_fps=fps
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    with pytest.raises(ValueError, match="corpus_df"):
        exact_dedup_against(new)
