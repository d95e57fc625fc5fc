"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship expansion on sf0.001;
``queries()``/``oracle_sql()`` pair every implemented operator with a DuckDB
oracle at sf0.01 (row-count + schema + value-hash compare). Non-SQL ops
(the CDC replay) omit the oracle -> rows-only check; their real correctness
gate is tests/test_cdc.py's token-array-equality vs the pure-Python oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# expansion operator queries
# ---------------------------------------------------------------------------

def _expand_props_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark import expand_json

    return expand_json(
        _events(spark, sf_dir),
        {
            "json_column_name": "props",
            "expanded_columns": [{"name": "k", "type": "long"}],
        },
        mode="catalyst",
    )


def _expand_props_long_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as expand_props_long through the Arrow general path —
    the two physical strategies are cross-checked against ONE oracle."""
    from embulk_filter_expand_json_spark import expand_json

    return expand_json(
        _events(spark, sf_dir),
        {
            "json_column_name": "props",
            "expanded_columns": [{"name": "k", "type": "long"}],
        },
        mode="arrow",
    )


def _expand_props_keep_and_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark import expand_json

    return expand_json(
        _events(spark, sf_dir),
        {
            "json_column_name": "props",
            "keep_expanding_json_column": True,
            "expanded_columns": [
                {"name": "k", "type": "string"},
                {"name": "missing.deep[2]", "type": "double"},
            ],
        },
        mode="catalyst",
    ).withColumnRenamed("missing.deep[2]", "missing_deep_2")


def _expand_props_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every cast target exercised on the same source value."""
    from embulk_filter_expand_json_spark import expand_json

    return expand_json(
        _events(spark, sf_dir),
        {
            "json_column_name": "props",
            "expanded_columns": [
                {"name": "k", "type": "double"},
                {"name": "k2", "type": "boolean"},
            ],
        },
        mode="catalyst",
    ).withColumnsRenamed({"k": "k_double", "k2": "k2_bool"})


# ---------------------------------------------------------------------------
# CDC operators
# ---------------------------------------------------------------------------

def _lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_lww import lww_dedup

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )
    return lww_dedup(ev, key="user_id", order="event_id", strategy="window")


def _lww_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_lww import lww_dedup

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )
    return lww_dedup(ev, key="user_id", order="event_id", strategy="agg")


def _lww_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_lww import lww_dedup

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )
    return lww_dedup(ev, key="user_id", order="event_id", strategy="salted")


def _lww_keyjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_lww import lww_dedup

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )
    return lww_dedup(ev, key="user_id", order="event_id", strategy="keyjoin")


_LWW_ORACLE = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def _cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end engine run: synthesize a deterministic change stream sized
    to the SF, replay it through expand -> LWW dedup -> exactly-once MERGE,
    and return the final table state. No SQL oracle (multi-step stateful op);
    parity gate is tests/test_cdc.py vs the pure-Python interpreter."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="cdc_entry_")
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, os.path.join(work, "log"))
        pipe = CdcPipeline(
            spark,
            os.path.join(work, "log"),
            os.path.join(work, "table"),
            num_buckets=8,
        )
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from files
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# training-data pipeline operators (SURVEY.md §2.2 + task brief)
# ---------------------------------------------------------------------------

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.functions.text import fingerprint

    return _documents(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def _token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.functions.text import (
        bpe_ish_token_count,
        punct_ratio,
        whitespace_token_count,
    )

    t = F.col("text")
    return _documents(spark, sf_dir).select(
        "doc_id",
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
    )


def _quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.functions.text import quality_score

    return _documents(spark, sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("qscore")
    )


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.functions.text import lang_id

    return _documents(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    )


def _exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_text import exact_dedup

    return exact_dedup(_documents(spark, sf_dir))


def _exact_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        exact_dup_groups,
    )

    g = exact_dup_groups(_documents(spark, sf_dir))
    return g.select(
        "fp",
        "n_dups",
        F.element_at("doc_ids", 1).alias("min_id"),
        F.element_at("doc_ids", -1).alias("max_id"),
    )


def _minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_lsh_pairs,
    )

    return minhash_lsh_pairs(
        _documents(spark, sf_dir), num_hashes=64, bands=16, threshold=0.8
    )


def _simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        simhash_near_dup_pairs,
    )

    return simhash_near_dup_pairs(_documents(spark, sf_dir), max_hamming=3)


def _knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.similarity import cosine_topk

    emb = _embeddings(spark, sf_dir)
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    return cosine_topk(emb, q, k=10)


def _knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.similarity import lsh_topk

    emb = _embeddings(spark, sf_dir)
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    return lsh_topk(emb, q, k=10, n_bits=4, n_probes=8)


def _embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _embeddings(spark, sf_dir)
    dim = len(emb.first()["embedding"])
    return embedding_near_dup_pairs(emb, dim=dim, threshold=0.99)


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def _streaming_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay as cdc_replay_state but driven through the Structured
    Streaming front-end (readStream -> foreachBatch -> idempotent MERGE).
    Rows-only check; cross-validated against the pure-Python oracle in
    tests/test_sources_streaming.py."""
    import time

    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable
    from embulk_filter_expand_json_spark.streaming.stream_apply import (
        run_streaming_apply,
    )

    work = tempfile.mkdtemp(prefix="cdc_stream_entry_")
    try:
        cfg = ChangeGenConfig(
            n_events=4_000, n_docs=200, batch_size=1_000, seed=42
        )
        write_changes(spark, cfg, os.path.join(work, "log"))
        q = run_streaming_apply(
            spark,
            changes_path=os.path.join(work, "log"),
            table_path=os.path.join(work, "table"),
            checkpoint_path=os.path.join(work, "ckpt"),
            num_buckets=4,
        )
        deadline = time.time() + 300
        while q.isActive and time.time() < deadline:
            time.sleep(1)
        if q.isActive:
            q.stop()
        out = SnapTable(spark, os.path.join(work, "table")).read().select(
            "doc_id", "n_tok", "source"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: expansion operator on sf0.001 events (drop-source mode)."""
    return _expand_props_long(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "expand_props_long": _expand_props_long,
        "expand_props_long_arrow": _expand_props_long_arrow,
        "expand_props_keep_and_missing": _expand_props_keep_and_missing,
        "expand_props_types": _expand_props_types,
        "lww_dedup_window": _lww_window,
        "lww_dedup_agg": _lww_agg,
        "lww_dedup_salted": _lww_salted,
        "lww_dedup_keyjoin": _lww_keyjoin,
        "cdc_replay_state": _cdc_replay_state,
        "streaming_replay_state": _streaming_replay_state,
        "doc_fingerprint": _doc_fingerprint,
        "token_stats": _token_stats,
        "quality_scores": _quality_scores,
        "lang_id": _lang_id,
        "exact_dedup_docs": _exact_dedup_docs,
        "exact_dup_stats": _exact_dup_stats,
        "minhash_near_dups": _minhash_near_dups,
        "simhash_near_dups": _simhash_near_dups,
        "knn_bruteforce": _knn_bruteforce,
        "knn_lsh": _knn_lsh,
        "embedding_near_dups": _embedding_near_dups,
    }


def oracle_sql() -> dict[str, str]:
    expand_long = """
        SELECT event_id, ts, user_id, event_type, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """
    return {
        "expand_props_long": expand_long,
        "expand_props_long_arrow": expand_long,
        "expand_props_keep_and_missing": """
            SELECT event_id, ts, user_id, event_type, value, props,
                   json_extract_string(props, '$.k') AS k,
                   CAST(json_extract_string(props, '$.missing.deep[2]') AS DOUBLE)
                       AS missing_deep_2
            FROM events
        """,
        "expand_props_types": """
            SELECT event_id, ts, user_id, event_type, value,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_double,
                   (lower(json_extract_string(props, '$.k2')) = 'true') AS k2_bool
            FROM events
        """,
        "lww_dedup_window": _LWW_ORACLE,
        "lww_dedup_agg": _LWW_ORACLE,
        "lww_dedup_salted": _LWW_ORACLE,
        "lww_dedup_keyjoin": _LWW_ORACLE,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))) AS fp
            FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                       AS bpe_tokens,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE round(len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                                   / length(text), 6) END AS punct_ratio
            FROM documents
        """,
        "quality_scores": """
            WITH w AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                               / length(text) END AS pr,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words
              FROM documents
            )
            SELECT doc_id,
                   round((least(n_chars / 500.0, 1.0)
                          + (1.0 - least(pr * 4.0, 1.0))
                          + least(CASE WHEN len(words) = 0 THEN 0.0
                                       ELSE len(list_filter(words,
                                           w -> w IN ('the','and','of','to','in')))::DOUBLE
                                            / len(words) END * 5.0, 1.0)
                         ) / 3.0, 6) AS qscore
            FROM w
        """,
        "lang_id": """
            WITH w AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words
              FROM documents
            ), h AS (
              SELECT doc_id,
                len(list_filter(words, x -> x IN ('the','and','of','to','in'))) AS h_en,
                len(list_filter(words, x -> x IN ('der','die','und','nicht','das'))) AS h_de,
                len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS h_fr,
                len(list_filter(words, x -> x IN ('el','la','que','de','los'))) AS h_es
              FROM w
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                        WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                        WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                        WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM h
        """,
        "exact_dedup_docs": """
            SELECT doc_id, text, lang, source, n_chars FROM (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
                       ORDER BY doc_id) AS rn
              FROM documents
            ) WHERE rn = 1
        """,
        "exact_dup_stats": """
            SELECT md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))) AS fp,
                   count(*) AS n_dups,
                   min(doc_id) AS min_id,
                   max(doc_id) AS max_id
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # no oracle (rows-only): cdc_replay_state (stateful multi-step; parity
        # proven in tests/test_cdc.py vs the pure-Python interpreter),
        # minhash_near_dups / simhash_near_dups / knn_lsh /
        # embedding_near_dups (hash-randomized candidate generation is not
        # ANSI-SQL-expressible; correctness pinned by tests/test_text_ops.py
        # planted-duplicate fixtures and the exact-jaccard / brute-force
        # cross-checks)
    }
