"""Curation-operator tests: PII redaction, decontamination, mixing sample,
sequence packing — exact expected outputs, python/duckdb cross-checks, and
partitioning-invariance (the determinism the oracle contract relies on)."""

import hashlib

import duckdb
import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.operators.curation import (
    DEFAULT_PII_RULES,
    decontaminate,
    mix_sample,
    pack_sequences,
    pii_counts,
    redact_pii,
)

PII_CASES = [
    # (raw, redacted, (n_email, n_phone, n_card, n_ipv4))
    (
        "mail me at jane.doe+spam@example.co.uk today",
        "mail me at <EMAIL> today",
        (1, 0, 0, 0),
    ),
    (
        "call +1-555-0134 or +44-020-7946-0958 now",
        "call <PHONE> or <PHONE> now",
        (0, 2, 0, 0),
    ),
    (
        "card 4111111111111111 exp 12/26",
        "card <CARD> exp 12/26",
        (0, 0, 1, 0),
    ),
    ("host 10.1.2.3 and 192.168.0.255", "host <IP> and <IP>", (0, 0, 0, 2)),
    # email digits must NOT be eaten by the card rule (order contract)
    (
        "a12345678901234b@x.io 1234567890123",
        "<EMAIL> <CARD>",
        (1, 0, 1, 0),
    ),
    ("no pii here at all", "no pii here at all", (0, 0, 0, 0)),
]


def test_redact_pii_exact(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(PII_CASES)], "i long, t string"
    )
    got = (
        df.select("i", redact_pii(F.col("t")).alias("r"), *pii_counts(F.col("t")))
        .orderBy("i")
        .collect()
    )
    for row, (_, want_red, want_counts) in zip(got, PII_CASES):
        assert row["r"] == want_red
        assert (
            row["n_email"],
            row["n_phone"],
            row["n_card"],
            row["n_ipv4"],
        ) == want_counts


def test_redact_pii_duckdb_parity(spark):
    """The same regex chain must behave identically under RE2 (DuckDB) —
    the property the contract oracle depends on."""
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(PII_CASES)], "i long, t string"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select("i", redact_pii(F.col("t")).alias("r")).collect()
    }
    con = duckdb.connect()
    expr = "t"
    for _, pattern, repl in DEFAULT_PII_RULES:
        sql_pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    for i, (raw, _, _) in enumerate(PII_CASES):
        (duck,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [raw]
        ).fetchone()
        assert duck == got[i], f"case {i}: duckdb={duck!r} spark={got[i]!r}"


def test_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta"),  # contains bench 5-gram
            (1, "one two three four five six seven eight"),  # clean
            (2, "tiny doc"),  # <5 words, whole-text matches bench doc 12
            (3, "unrelated words entirely distinct tokens here"),  # clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (10, "prefix alpha beta gamma delta epsilon suffix"),
            (12, "padding tiny doc padding extra words"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, n=5).collect()
    }
    # doc 0 shares the 5-gram 'alpha beta gamma delta epsilon'; doc 2 has
    # <5 words so its whole text 'tiny doc' must match bench 12's
    # 'tiny doc' 2-of-5-gram... no: bench grams are 5-grams of bench docs,
    # and 'tiny doc' is not a 5-gram of doc 12 -> doc 2 stays clean.
    assert got == {0: True, 1: False, 2: False, 3: False}
    # short BENCH doc (<5 words) contributes its whole text as one gram,
    # which a short corpus doc can then match whole-for-whole
    bench_short = spark.createDataFrame([(13, "tiny doc")], "doc_id long, text string")
    got2 = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench_short, n=5).collect()
    }
    assert got2 == {0: False, 1: False, 2: True, 3: False}


def _bucket(salt: str, key) -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    return int(h, 16) % 1_000_000


def test_mix_sample(spark):
    rows = [(i, f"src{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
    kept = {
        r["doc_id"]
        for r in mix_sample(df, rates, salt="mixT").select("doc_id").collect()
    }
    want = {
        i
        for i, src in rows
        if _bucket("mixT", i) < int(rates[src] * 1_000_000)
    }
    assert kept == want
    assert all(i in kept for i, s in rows if s == "src0")
    assert not any(i in kept for i, s in rows if s == "src1")
    # default_rate drops unknown strata
    kept2 = mix_sample(df, {"src0": 1.0}, salt="mixT").select("source").distinct()
    assert [r["source"] for r in kept2.collect()] == ["src0"]
    # partitioning-invariant
    kept3 = {
        r["doc_id"]
        for r in mix_sample(df.repartition(7), rates, salt="mixT")
        .select("doc_id")
        .collect()
    }
    assert kept3 == kept


def _pack_reference(rows, budget, salt, n_buckets):
    """Pure-python greedy packer over the same md5 buckets."""
    by_bucket = {}
    for doc_id, tok in rows:
        by_bucket.setdefault(_bucket(salt, doc_id) % n_buckets, []).append(
            (doc_id, tok)
        )
    out = {}
    for b, docs in by_bucket.items():
        seq = fill = 0
        for doc_id, tok in sorted(docs):
            if fill > 0 and fill + tok > budget:
                seq += 1
                fill = 0
            fill += tok
            out[doc_id] = (b, seq)
    return out


def test_pack_sequences(spark):
    # include an over-budget doc (300) and a zero-token doc
    rows = [(i, [40, 100, 0, 300, 77, 128, 256, 13][i % 8]) for i in range(160)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = pack_sequences(
        df, budget=256, token_col="n_tok", n_buckets=4, salt="packT"
    ).collect()
    want = _pack_reference(rows, 256, "packT", 4)
    assert len(got) == len(rows)  # nothing dropped or duplicated
    for r in got:
        assert (r["bucket"], r["seq_id"]) == want[r["doc_id"]], r["doc_id"]
    # per-sequence invariant: fill <= budget unless a single over-budget doc
    fills = {}
    for r in got:
        fills.setdefault((r["bucket"], r["seq_id"]), []).append(r["n_tok"])
    for toks in fills.values():
        assert sum(toks) <= 256 or len([t for t in toks if t > 0]) == 1


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0, token_col="n_tok")


# ------------------------------------------- exact duplicate substrings

def test_duplicate_spans(spark):
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    boiler = (
        "subscribe to our newsletter for daily updates and exclusive "
        "offers today only dear friends"
    )
    assert len(boiler.split()) == 14
    rows = [
        # docs 0/1 share a 15-token prefix (boiler + 'x') and differ after
        (0, boiler + " x unique tail zero alpha beta gamma"),
        (1, boiler + " x unique tail one delta epsilon zeta"),
        # doc 2: within-doc repetition of a 15-token run (counts twice)
        (2, boiler + " y " + boiler + " y closing words here now"),
        # doc 3: too short for any window
        (3, "tiny document"),
        # doc 4: clean, no shared windows
        (4, "completely different content about query engines and vectorized execution pipelines running fast always everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_spans(df, window=15).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
    # docs 0 and 1 share the 17-token prefix (boiler + 'x unique tail'),
    # so windows 0..2 are marked and merge into one span (0, 16)
    assert by_doc[0] == [(0, 16)]
    assert by_doc[1] == [(0, 16)]
    # doc 2's repeated run marks windows in both copies; doc 3/4 clean
    assert 2 in by_doc
    assert 3 not in by_doc and 4 not in by_doc

    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, window=15).collect()
    }
    assert len(cleaned) == len(rows)  # rows never dropped
    # doc 0 keeps its tail, loses the shared prefix
    assert cleaned[0] == "zero alpha beta gamma"
    assert cleaned[1] == "one delta epsilon zeta"
    # untouched docs come back token-normalized but content-identical
    assert cleaned[3] == "tiny document"
    assert cleaned[4] == rows[4][1]
    # removal drops exactly the spanned positions on every doc
    for i, text in rows:
        ws = text.lower().split()
        covered = set()
        for r in duplicate_spans(df, window=15).collect():
            if r["doc_id"] == i:
                covered.update(range(r["span_start"], r["span_end"] + 1))
        want = " ".join(
            w for p, w in enumerate(ws) if p not in covered
        )
        assert cleaned[i] == want, i


def test_redact_pii_differential_fuzz(spark):
    """Seeded-random differential: the full redaction chain must agree
    byte-for-byte between Java regex (Spark) and RE2 (DuckDB) on 300
    random ASCII strings plus adversarial near-PII edges (digit runs
    longer than the card range, 4-dot IPs, boundary-less digits) — the
    cross-engine property the contract oracle stands on."""
    import random
    import string

    rng = random.Random(7)
    chars = string.ascii_letters + string.digits + " .@+-%_|/:;!?#'\n\t"
    cases = [
        "".join(rng.choice(chars) for _ in range(rng.randint(0, 80)))
        for _ in range(300)
    ]
    cases += [
        "a@b.cd", "1.2.3.4", "999.999.999.999", "+1-555-0134-99999",
        "0000000000000", "@@@", "x@y", "1234567890123456789012",
        "10.0.0.1.2", "a+b@c-d.ee 1.1.1.1", "+12-345-6789",
        "email@at@double.com", ".1.2.3.4.", "4111 1111 1111 1111",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select("i", redact_pii(F.col("t")).alias("r")).collect()
    }
    expr = "t"
    for _, pattern, repl in DEFAULT_PII_RULES:
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i BIGINT, t VARCHAR)")
    con.executemany(
        "INSERT INTO c VALUES (?, ?)", [(i, c) for i, c in enumerate(cases)]
    )
    duck = dict(con.execute(f"SELECT i, {expr} FROM c").fetchall())
    for i, c in enumerate(cases):
        assert duck[i] == got[i], f"case {i}: {c!r}: {duck[i]!r} != {got[i]!r}"


def test_select_token_budget(spark):
    from embulk_filter_expand_json_spark.operators.curation import (
        select_token_budget,
    )

    rows = [
        # (doc_id, score, tokens) — global order: score desc, id asc
        (1, 0.95, 40),
        (2, 0.95, 30),   # tie with 1 -> id breaks it
        (3, 0.90, 50),
        (4, 0.50, 100),
        (5, 0.10, 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, tok long")

    def kept(budget, resolution=1000):
        out = select_token_budget(
            df, budget, token_col="tok", score_col="score", resolution=resolution
        )
        return sorted(r["doc_id"] for r in out.collect())

    # prefix sums: 40, 70, 120, 220, 230
    assert kept(120) == [1, 2, 3]
    assert kept(119) == [1, 2]     # doc 3 overflows -> excluded, and so is
    assert kept(60) == [1]         # everything after (monotone cumsum)
    assert kept(1000) == [1, 2, 3, 4, 5]  # whole corpus fits
    assert kept(39) == []          # first doc already overflows
    # coarse resolution forces the tied pair + doc 3 into ONE boundary
    # bucket (floor(score*10) = 9): the windowed residual path must still
    # reproduce the exact global-order prefix
    assert kept(70, resolution=10) == [1, 2]
    assert kept(120, resolution=10) == [1, 2, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        select_token_budget(df, 0, token_col="tok", score_col="score")


def test_top_ngrams_tournament_is_exact(spark):
    """The salted two-level top-k equals the naive single-window top-k
    (every gram lives in exactly one salt bucket, so pruning to k per
    bucket can never evict a global top-k gram)."""
    import random

    from pyspark.sql import Window
    from embulk_filter_expand_json_spark.operators.curation import top_ngrams
    from embulk_filter_expand_json_spark.functions.text import word_ngrams

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (f"l{rng.randrange(3)}", " ".join(rng.choices(vocab, k=rng.randrange(2, 40))))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = top_ngrams(df, n=2, k=5, by="lang", min_count=1, salt_buckets=7)

    naive = (
        df.select(F.col("lang"), F.explode(word_ngrams(F.col("text"), 2)).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram")))
            .cast("long"),
        )
        .filter(F.col("rank") <= 5)
        .select("lang", "gram", "cnt", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
