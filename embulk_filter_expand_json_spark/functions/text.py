"""Text-analysis functions for training-data pipelines — all pure Catalyst
expressions (JVM-side, whole-stage codegen; zero Python in the hot path).

These extend the engine beyond the reference's operator set: a 100 TB
training-data ingest needs language ID, quality scoring, token counting and
document fingerprinting next to the CDC apply stage. Each function returns a
Column usable in any select; `__spark_entry__.py` pairs them with DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language-ID. Deterministic and SQL-replicable (the oracle uses the same
#: lists); a real deployment would swap in fastText — the *plumbing* (pure
#: column expression, no shuffle) is the point.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}


def whitespace_token_count(text: Column) -> Column:
    """Tokens by whitespace split (empty string -> 0)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: word pieces + punctuation as separate tokens."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double") / n.cast("double")
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(markers, w)))
    n = F.size(words)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long enough, not punctuation-soup, has stopwords.
    The exact formula is arbitrary; determinism + SQL-parity is the contract."""
    n_chars = F.length(text)
    len_score = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(
        punct_ratio(text) * F.lit(4.0), F.lit(1.0)
    )
    stop_score = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    return F.round(
        (len_score + punct_penalty + stop_score) / F.lit(3.0), 6
    )


def lang_id(text: Column) -> Column:
    """argmax over per-language marker-word hit counts; 'und' (undetermined)
    when nothing matches."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def _word_ngram_dup_frac(words: Column, n: int) -> Column:
    """Fraction of duplicated word n-grams: 1 - distinct/total (0.0 when
    fewer than n words). The Gopher-style repetition signal — natural text
    repeats few n-grams; boilerplate/spam repeats many.

    Both the word array and the gram array are let-bound (_let1): embedding
    them in the lambda/when bodies re-evaluates the split per element_at
    call — n re-splits of the document per gram."""

    def calc(ws: Column) -> Column:
        k = F.size(ws)
        grams = F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + F.lit(j)) for j in range(n)]
            ),
        )

        def frac(gs: Column) -> Column:
            return (
                F.lit(1.0)
                - F.size(F.array_distinct(gs)).cast("double")
                / F.size(gs).cast("double")
            )

        return F.when(k < n, F.lit(0.0)).otherwise(
            F.round(_let1(grams, frac), 6)
        )

    return _let1(words, calc)


def repetition_metrics(text: Column):
    """(n_words, type_token_ratio, dup_2gram_frac, dup_3gram_frac) — the
    repetition-based quality filters of large-scale curation pipelines
    (Gopher/C4-style), pure Catalyst, zero shuffle."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(words)
    ttr = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.array_distinct(words)).cast("double") / n.cast("double"),
            6,
        )
    )
    return (
        n.alias("n_words"),
        ttr.alias("type_token_ratio"),
        _word_ngram_dup_frac(words, 2).alias("dup_2gram_frac"),
        _word_ngram_dup_frac(words, 3).alias("dup_3gram_frac"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/punct/space
    normalized text (md5 so the DuckDB oracle can reproduce it bit-exact)."""
    normalized = F.lower(F.regexp_replace(text, r"[^A-Za-z0-9]+", ""))
    return F.md5(normalized)


def _let(value: Column, body) -> Column:
    """Let-binding for higher-order functions: evaluate ``value`` ONCE per
    row and pass it to ``body`` as a lambda variable. An expression embedded
    directly in a HOF lambda body is re-evaluated per ELEMENT (HOFs are
    interpreted, no subexpression elimination) — for char_ngrams that meant
    one lower+regexp_replace of the whole document per shingle, O(len^2)
    with a regex inside (measured 4.5x the whole MinHash signature cost).
    ``body`` must return an array; the single-element wrapper flattens away.
    """
    return F.flatten(F.transform(F.array(value), body))


def _let1(value: Column, body) -> Column:
    """Scalar-result let-binding (see _let): evaluate ``value`` once per
    row, apply ``body`` (returning a scalar Column), unwrap."""
    return F.element_at(F.transform(F.array(value), body), 1)


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Array of character n-grams of the normalized text (shingles for
    MinHash). Pure Catalyst: sequence + transform + substring, with the
    normalized string let-bound so it computes once per row."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))

    def gen(s: Column) -> Column:
        ln = F.length(s)
        return F.when(ln < n, F.array(s)).otherwise(
            F.transform(
                F.sequence(F.lit(1), ln - F.lit(n - 1)),
                lambda i: F.substring(s, i, n),
            )
        )

    return _let(normalized, gen)


def word_ngrams(text: Column, n: int = 3) -> Column:
    split = F.split(F.lower(F.trim(text)), r"\s+")

    def gen(words: Column) -> Column:
        k = F.size(words)
        return F.when(k < n, F.array(F.array_join(words, " "))).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - F.lit(n)),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            )
        )

    return _let(split, gen)
