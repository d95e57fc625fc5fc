"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship expansion on sf0.001;
``queries()``/``oracle_sql()`` pair every implemented operator with a DuckDB
oracle at sf0.01 (row-count + schema + value-hash compare): all 36 queries
are hard-verified — the near-dup/ANN family via deterministic planted
fixtures derived in-query, and the two stateful replays by materializing
their deterministic change logs at fixed paths and SQL-replaying them in
the oracle (LWW window + delete suppression + invalid-record drop).
tests/test_cdc.py additionally pins token-array equality vs the pure-Python
interpreter. Local replica of the driver compare: scripts/check_contract.py.
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


def _ts_json_doc(spark: SparkSession, sf_dir: str, with_fraction: bool):
    """Deterministic JSON docs derived from events: a wall-clock timestamp
    built by pure integer arithmetic (session-timezone-independent), a
    nested json object, and a planted invalid fraction (every 17th row gets
    an unparseable timestamp -> the invalid-record drop channel)."""
    ev = _events(spark, sf_dir)
    eid = F.col("event_id")
    base = F.format_string(
        "2024-03-%02d %02d:%02d:%02d",
        (eid % 28 + 1).cast("int"),
        (eid % 24).cast("int"),
        (eid % 60).cast("int"),
        ((eid * 7) % 60).cast("int"),
    )
    if with_fraction:
        # 9 fractional digits: exercises the Embulk-ns -> Spark-us truncation
        base = F.concat(
            base, F.lit("."), F.lpad((eid % 1000000).cast("string"), 6, "0"),
            F.lit("789"),
        )
    t_str = F.when(eid % 17 == 0, F.lit("BROKEN")).otherwise(base)
    payload = F.concat(
        F.lit('{"t":"'), t_str,
        F.lit('","j":{"a":"'), F.col("event_type"),
        F.lit('","b":'), F.col("user_id").cast("string"), F.lit("}}"),
    )
    return ev.select("event_id", payload.alias("payload"))


def _expand_ts_json_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-path hard verification of the timestamp cast (per-column
    timezone Asia/Tokyo + %N nanosecond truncation), the json cast
    (canonical compact text), and the invalid-record drop (planted BROKEN
    rows vanish). Timestamps compared as epoch micros so the oracle hash is
    timezone-rendering-independent."""
    from embulk_filter_expand_json_spark import expand_json

    out = expand_json(
        _ts_json_doc(spark, sf_dir, with_fraction=True),
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {
                    "name": "t",
                    "type": "timestamp",
                    "format": "%Y-%m-%d %H:%M:%S.%N",
                    "timezone": "Asia/Tokyo",
                },
                {"name": "j", "type": "json"},
            ],
            "stop_on_invalid_record": False,
        },
        mode="arrow",
    )
    return out.select("event_id", F.unix_micros("t").alias("t_us"), "j")


def _expand_ts_json_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-path twin of expand_ts_json_arrow (whole-second format —
    the fraction-free format is Catalyst-translatable); same oracle shape:
    per-column timezone + json cast + invalid drop, zero Python."""
    from embulk_filter_expand_json_spark import expand_json

    out = expand_json(
        _ts_json_doc(spark, sf_dir, with_fraction=False),
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {
                    "name": "t",
                    "type": "timestamp",
                    "format": "%Y-%m-%d %H:%M:%S",
                    "timezone": "Asia/Tokyo",
                },
                {"name": "j", "type": "json"},
            ],
            "stop_on_invalid_record": False,
        },
        mode="catalyst",
    )
    return out.select("event_id", F.unix_micros("t").alias("t_us"), "j")


def _expand_ts_century(spark: SparkSession, sf_dir: str) -> DataFrame:
    """%C (century) and %g (2-digit ISO week-year) timestamp tokens through
    the Arrow path's pre-parse century rewrite (Ruby dialect:
    ExpandJsonFilterPlugin.java:77-79): cd uses %C%y with an explicit
    century, gd uses %g-%V-%u with the Ruby 00-68 -> 2000s pivot. Every
    23rd row carries an unparseable date (invalid-record drop). Timestamps
    compared as epoch micros; the oracle rebuilds the ISO week date from
    Jan-4 arithmetic, independent of any strptime dialect."""
    from embulk_filter_expand_json_spark import expand_json

    ev = _events(spark, sf_dir)
    eid = F.col("event_id")
    cd_str = F.format_string(
        "%02d%02d-%02d-%02d",
        (eid % 2 + 19).cast("int"), (eid % 100).cast("int"),
        (eid % 12 + 1).cast("int"), (eid % 28 + 1).cast("int"),
    )
    cd_str = F.when(eid % 23 == 0, F.lit("xx-xx")).otherwise(cd_str)
    gd_str = F.format_string(
        "%02d-%02d-%d",
        (eid % 100).cast("int"), (eid % 52 + 1).cast("int"),
        (eid % 7 + 1).cast("int"),
    )
    payload = F.concat(
        F.lit('{"cd":"'), cd_str, F.lit('","gd":"'), gd_str, F.lit('"}'),
    )
    out = expand_json(
        ev.select("event_id", payload.alias("payload")),
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {"name": "cd", "type": "timestamp", "format": "%C%y-%m-%d"},
                {"name": "gd", "type": "timestamp", "format": "%g-%V-%u"},
            ],
            "stop_on_invalid_record": False,
        },
        mode="arrow",
    )
    return out.select(
        "event_id",
        F.unix_micros("cd").alias("cd_us"),
        F.unix_micros("gd").alias("gd_us"),
    )


def _expand_struct_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json-typed (parsed struct) source column — the reference accepts
    json-typed input and re-serializes (ExpandJsonFilterPlugin.java:114-119;
    FilteredPageOutput.java:324-332); the Spark analog is a StructType
    column expanded through implicit to_json."""
    from embulk_filter_expand_json_spark import expand_json

    src = _events(spark, sf_dir).select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
        ).alias("payload"),
    )
    return expand_json(
        src,
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {"name": "uid", "type": "long"},
                {"name": "etype", "type": "string"},
            ],
        },
        mode="catalyst",
    )


def _expand_tail_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jayway path functions (.length()/.sum() aggregations plus the
    parameterized .concat()/.append()) through the Arrow general path — a
    derived payload with a deterministic int array + tag list per event,
    verified against DuckDB string/list operations."""
    from embulk_filter_expand_json_spark import expand_json

    ev = _events(spark, sf_dir)
    arr = F.sequence(F.lit(1), (F.col("event_id") % 5 + 1).cast("int"))
    src = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                arr.alias("a"),
                F.array(F.col("event_type"), F.lit("k")).alias("tags"),
                (F.col("event_id") % 7).alias("n"),
            )
        ).alias("payload"),
    )
    return expand_json(
        src,
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {"name": "a.length()", "type": "long"},
                {"name": "a.sum()", "type": "double"},
                # concat: string items of the array model, then params
                # (a literal and a $-rooted path, toString()'d)
                {"name": "tags.concat('-', $.n)", "type": "string"},
                # append: array model + param -> compact JSON string
                {"name": "tags.append($.n)", "type": "string"},
            ],
        },
        mode="arrow",
    ).withColumnsRenamed(
        {
            "a.length()": "a_len",
            "a.sum()": "a_sum",
            "tags.concat('-', $.n)": "tag_cat",
            "tags.append($.n)": "tag_app",
        }
    )


def _expand_lineitem_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expansion operator over TPC-H lineitem width/scale (6M rows at
    sf1): JSON-ify four columns, expand them back — a round-trip oracle on
    the largest table in the testdata."""
    from embulk_filter_expand_json_spark import expand_json

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    src = li.select(
        "l_suppkey",
        F.to_json(
            F.struct(
                F.col("l_orderkey").alias("ok"),
                F.col("l_linenumber").alias("ln"),
                F.col("l_returnflag").alias("rf"),
                F.col("l_linestatus").alias("ls"),
            )
        ).alias("payload"),
    )
    return expand_json(
        src,
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {"name": "ok", "type": "long"},
                {"name": "ln", "type": "long"},
                {"name": "rf", "type": "string"},
                {"name": "ls", "type": "string"},
            ],
        },
        mode="catalyst",
    )


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


#: fixed log locations so the DuckDB oracle can read the SAME deterministic
#: change stream the engine replayed (the stream is a pure function of the
#: seed, so materializing it in-query and SQL-replaying it in the oracle is
#: the same planted-fixture pattern as the near-dup queries)
# 30-min-gap sessionization as pure SQL: lag -> boundary flag -> running
# sum. ONE definition of the gap rule; the batch, chunked, and streaming
# sessionizers all verify against final SELECTs over this same CTE chain.
_SESSIONIZE_CTE = """
    WITH lagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, t_us,
             CASE WHEN prev_us IS NULL
                       OR t_us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ), sess AS (
      SELECT user_id, t_us,
             -- CAST: DuckDB sum(INT) yields HUGEINT (int128), which the
             -- driver's value hasher stringifies differently from Spark's
             -- BIGINT even when values are identical (r3 verdict #1).
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM marked
    )
"""

_SESSIONIZE_ORACLE = _SESSIONIZE_CTE + """
    SELECT user_id, session_seq, count(*) AS n_events,
           min(t_us) AS start_us, max(t_us) AS end_us,
           max(t_us) - min(t_us) AS duration_us
    FROM sess GROUP BY user_id, session_seq
"""

# brute-force top-10 over embeddings + nine planted scaled clones of the
# query vector — the shared oracle for BOTH ANN index lifecycles (LSH and
# IVF probe the same fixture and must recover the same exact answer)
_KNN_PLANTED_ORACLE = """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0),
    uni AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      UNION ALL
      SELECT 1000000 + i AS vec_id,
             list_transform(
               (SELECT embedding FROM embeddings WHERE vec_id = 0),
               x -> CAST(x * (1.0 + i / 10000.0) AS FLOAT))::DOUBLE[]
      FROM generate_series(1, 9) t(i)
    )
    SELECT vec_id, round(list_cosine_similarity(emb, q.qv), 6) AS cosine
    FROM uni, q
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
"""

# oracle logs live at FIXED paths: oracle_sql() strings are built at import
# time and DuckDB reads them by literal path. Namespaced per-UID so two
# users' harness runs cannot clobber each other (two runs by the SAME
# user must still not race — the driver runs queries sequentially).
_ORACLE_TMP = f"/tmp/spark_graft_oracle_{os.getuid()}"
_CDC_ORACLE_LOG = f"{_ORACLE_TMP}/cdc_log"
_STREAM_ORACLE_LOG = f"{_ORACLE_TMP}/stream_log"
_DLQ_ORACLE_LOG = f"{_ORACLE_TMP}/dlq_log"
_ASOF_ORACLE_LOG = f"{_ORACLE_TMP}/asof_log"


def _replay_oracle_sql(log_path: str) -> str:
    """SQL replay of expand -> LWW -> delete suppression over the materialized
    change log: drop invalid payloads (malformed JSON, or a string-typed
    ``tokens`` whose content is not itself valid JSON — the json-cast
    invalid-record channel, mirroring reference_oracle._valid_upsert), take
    each doc's max-offset row (LWW), suppress delete winners — exactly
    SnapTable's merge semantics (_LWW_ORACLE's shape plus the invalid-drop
    and the op filter)."""
    return f"""
        WITH log AS (
          SELECT * FROM read_parquet('{log_path}/epoch=*/*.parquet')
        ), valid AS (
          SELECT log_offset, op,
                 json_extract_string(payload, '$.doc_id') AS doc_id,
                 CAST(json_extract_string(payload, '$.n_tok') AS INT) AS n_tok,
                 json_extract_string(payload, '$.source') AS source
          FROM log
          WHERE json_valid(payload)
            AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                 OR json_valid(json_extract_string(payload, '$.tokens')))
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY log_offset DESC) AS rn
          FROM valid WHERE doc_id IS NOT NULL
        )
        SELECT doc_id, n_tok, source FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end engine run: synthesize a deterministic change stream sized
    to the SF, replay it through expand -> LWW dedup -> exactly-once MERGE,
    and return the final table state. Hard-verified: the log is materialized
    at a fixed path and the DuckDB oracle replays it in SQL (LWW window +
    delete suppression + invalid-drop). tests/test_cdc.py additionally pins
    token-array equality vs the pure-Python interpreter."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="cdc_entry_")
    shutil.rmtree(_CDC_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _CDC_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _CDC_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
        )
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from files
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_CDF_ORACLE_LOG = f"{_ORACLE_TMP}/cdf_log"


def _changefeed_oracle_sql(log_path: str) -> str:
    """SQL mirror of the change data feed: per-(epoch, doc) LWW winners of
    the VALID change rows — same invalid-drop and doc_id filter as
    _replay_oracle_sql, but partitioned by (epoch, doc_id) instead of doc_id
    (the feed is the per-commit after-image, deletes included rather than
    suppressed)."""
    return f"""
        WITH log AS (
          SELECT * FROM read_parquet('{log_path}/epoch=*/*.parquet',
                                     hive_partitioning=1)
        ), valid AS (
          SELECT log_offset, CAST(epoch AS BIGINT) AS epoch, op,
                 json_extract_string(payload, '$.doc_id') AS doc_id,
                 CAST(json_extract_string(payload, '$.n_tok') AS INT) AS n_tok,
                 json_extract_string(payload, '$.source') AS source,
                 json_extract_string(payload, '$.lang') AS lang
          FROM log
          WHERE json_valid(payload)
            AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                 OR json_valid(json_extract_string(payload, '$.tokens')))
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY epoch, doc_id ORDER BY log_offset DESC) AS rn
          FROM valid WHERE doc_id IS NOT NULL
        )
        SELECT epoch AS _commit_epoch, doc_id,
               CASE WHEN op = 'D' THEN 'delete' ELSE 'upsert' END
                 AS _change_type,
               n_tok, source, lang
        FROM ranked WHERE rn = 1
    """


def _cdc_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed lifecycle, hard-verified: same deterministic replay
    as cdc_replay_state but with the changelog property on; the result is
    SnapTable.read_changes(0) — every per-commit LWW after-image (deletes
    included) — and the DuckDB oracle recomputes the same feed straight from
    the materialized log (per-(epoch, doc) winners). This pins that the
    retained change files survive the CoW/MoR rewrite machinery byte-true
    across the whole replay, including the mid-stream schema evolution that
    adds the 'lang' column."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="cdf_entry_")
    shutil.rmtree(_CDF_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _CDF_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _CDF_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
        )
        pipe.run()
        feed = pipe.table.read_changes(0)
        lang = (
            F.col("lang")
            if "lang" in feed.columns
            else F.lit(None).cast("string")
        )
        out = feed.select(
            "_commit_epoch",
            "doc_id",
            "_change_type",
            "n_tok",
            "source",
            lang.alias("lang"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_DBZ_ORACLE_LOG = f"{_ORACLE_TMP}/dbz_log"
_MXW_ORACLE_LOG = f"{_ORACLE_TMP}/mxw_log"


def _cdc_debezium_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binlog-envelope front-end, hard-verified end to end: the synthetic
    change stream is wrapped into Debezium JSON envelopes (op c/u/d,
    before/after images, source.lsn) and materialized; the engine path is
    decode_debezium (pure-Catalyst get_json_object projection) -> canonical
    change log -> full CdcPipeline replay; the DuckDB oracle parses the SAME
    envelope file with its own JSON functions (op normalization, delete =
    before image, lsn offset) and replays LWW + delete suppression +
    invalid-drop in SQL. p_malformed=0 here: a truncated doc embedded by
    concat would corrupt the envelope itself (op/lsn unreadable) — envelope-
    level corruption policy is pinned by tests/test_envelopes.py; the
    bad-typed invalid channel (tokens as a non-JSON string) stays on."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        generate_changes,
    )
    from embulk_filter_expand_json_spark.sources.envelopes import (
        decode_debezium,
        write_envelope_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="dbz_entry_")
    shutil.rmtree(_DBZ_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
            p_malformed=0.0,
        )
        env = generate_changes(spark, cfg).select(
            F.concat(
                F.lit('{"payload":{"op":"'),
                F.when(F.col("op") == "D", F.lit("d"))
                .when(F.col("op") == "I", F.lit("c"))
                .otherwise(F.lit("u")),
                F.lit('","source":{"lsn":'),
                F.col("log_offset").cast("string"),
                F.lit("},"),
                F.when(F.col("op") == "D", F.lit('"before":')).otherwise(
                    F.lit('"after":')
                ),
                F.col("payload"),
                F.lit("}}"),
            ).alias("value")
        )
        env.write.mode("overwrite").parquet(_DBZ_ORACLE_LOG)
        decoded = decode_debezium(
            spark.read.parquet(_DBZ_ORACLE_LOG), epoch_size=cfg.batch_size
        )
        log = os.path.join(work, "log")
        write_envelope_changes(decoded, log)
        pipe = CdcPipeline(spark, log, os.path.join(work, "table"), num_buckets=8)
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _envelope_replay_oracle_sql(decoded_cte: str) -> str:
    """Shared LWW tail over a decoder CTE that yields (log_offset, op,
    payload JSON). Mirrors _replay_oracle_sql's valid/ranked algebra."""
    return f"""
        WITH {decoded_cte}, valid AS (
          SELECT log_offset, op,
                 json_extract_string(payload, '$.doc_id') AS doc_id,
                 CAST(json_extract_string(payload, '$.n_tok') AS INT) AS n_tok,
                 json_extract_string(payload, '$.source') AS source
          FROM dec
          WHERE payload IS NOT NULL AND json_valid(CAST(payload AS VARCHAR))
            AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                 OR json_valid(json_extract_string(payload, '$.tokens')))
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY log_offset DESC) AS rn
          FROM valid WHERE doc_id IS NOT NULL
        )
        SELECT doc_id, n_tok, source FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _debezium_oracle_sql(log_path: str) -> str:
    """DuckDB parses the raw Debezium envelopes itself — independent
    op normalization (c/r->I, u->U, d->D), before-image deletes, lsn
    offsets — then replays the canonical LWW algebra."""
    return _envelope_replay_oracle_sql(f"""
        env AS (
          SELECT * FROM read_parquet('{log_path}/*.parquet')
        ), dec AS (
          SELECT
            CAST(json_extract_string(value, '$.payload.source.lsn') AS BIGINT)
              AS log_offset,
            CASE json_extract_string(value, '$.payload.op')
              WHEN 'c' THEN 'I' WHEN 'r' THEN 'I'
              WHEN 'u' THEN 'U' WHEN 'd' THEN 'D' END AS op,
            CASE WHEN json_extract_string(value, '$.payload.op') = 'd'
                 THEN json_extract(value, '$.payload.before')
                 ELSE json_extract(value, '$.payload.after') END AS payload
          FROM env WHERE value IS NOT NULL
        )""")


def _cdc_maxwell_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-envelope front-end (type insert/update/delete, row image in
    data, binlog file:pos position), hard-verified like the Debezium entry:
    decode_maxwell packs position into a monotone long (file_seq*2^32+pos —
    order survives binlog rotation) and the DuckDB oracle re-derives the
    SAME packing from the raw position strings with its own string/regex
    functions before replaying LWW in SQL."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        generate_changes,
    )
    from embulk_filter_expand_json_spark.sources.envelopes import (
        decode_maxwell,
        write_envelope_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="mxw_entry_")
    shutil.rmtree(_MXW_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
            p_malformed=0.0,
        )
        # position: rotate the binlog file every batch_size events so the
        # cross-file ordering property is exercised at contract scale, with
        # the byte offset restarting inside each file.
        env = generate_changes(spark, cfg).select(
            F.concat(
                F.lit('{"type":"'),
                F.when(F.col("op") == "D", F.lit("delete"))
                .when(F.col("op") == "I", F.lit("insert"))
                .otherwise(F.lit("update")),
                F.lit('","position":"master.'),
                F.lpad(
                    F.floor(F.col("log_offset") / cfg.batch_size).cast("string"),
                    6,
                    "0",
                ),
                F.lit(":"),
                F.pmod(F.col("log_offset"), F.lit(cfg.batch_size)).cast("string"),
                F.lit('","data":'),
                F.col("payload"),
                F.lit("}"),
            ).alias("value")
        )
        env.write.mode("overwrite").parquet(_MXW_ORACLE_LOG)
        decoded = decode_maxwell(
            spark.read.parquet(_MXW_ORACLE_LOG), epoch_size=4294967296
        )
        log = os.path.join(work, "log")
        write_envelope_changes(decoded, log)
        pipe = CdcPipeline(spark, log, os.path.join(work, "table"), num_buckets=8)
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _maxwell_oracle_sql(log_path: str) -> str:
    return _envelope_replay_oracle_sql(f"""
        env AS (
          SELECT * FROM read_parquet('{log_path}/*.parquet')
        ), dec AS (
          SELECT
            CAST(regexp_extract(
                   split_part(json_extract_string(value, '$.position'), ':', 1),
                   '([0-9]+)$', 1) AS BIGINT) * 4294967296
              + CAST(split_part(json_extract_string(value, '$.position'),
                                ':', 2) AS BIGINT) AS log_offset,
            CASE json_extract_string(value, '$.type')
              WHEN 'insert' THEN 'I' WHEN 'bootstrap-insert' THEN 'I'
              WHEN 'update' THEN 'U' WHEN 'delete' THEN 'D' END AS op,
            json_extract(value, '$.data') AS payload
          FROM env WHERE value IS NOT NULL
        )""")


_RQ_ORACLE_LOG = f"{_ORACLE_TMP}/rq_log"


_CNL_ORACLE_LOG = f"{_ORACLE_TMP}/cnl_log"


def _cdc_canal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal FlatMessage front-end (batched rows per envelope — the decode
    shape Debezium/Maxwell don't exercise), hard-verified: the synthetic
    stream is grouped into Canal envelopes (one per (8-offset window, op);
    es = window id, id = op code, data = offset-sorted payload batch),
    decoded by the Spark-4 Variant unnest kernel and replayed through
    CdcPipeline; the DuckDB oracle unnests the SAME raw envelopes with its
    own lateral range(json_array_length) and re-derives the identical
    (es, id, pos) offset pack in SQL before replaying LWW. The enveloping
    deliberately reorders LWW (the pack, not the original offset, is the
    order key) — both sides compute the same well-defined winner set; tie
    impossibility is structural (unique (es,id,pos) per row)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        generate_changes,
    )
    from embulk_filter_expand_json_spark.sources.envelopes import (
        decode_canal,
        write_envelope_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="cnl_entry_")
    shutil.rmtree(_CNL_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
            p_malformed=0.0,
        )
        changes = generate_changes(spark, cfg)
        opcode = (
            F.when(F.col("op") == "I", F.lit(0))
            .when(F.col("op") == "U", F.lit(1))
            .otherwise(F.lit(2))
        )
        canal_type = (
            F.when(F.col("op") == "I", F.lit("INSERT"))
            .when(F.col("op") == "U", F.lit("UPDATE"))
            .otherwise(F.lit("DELETE"))
        )
        env = (
            changes.groupBy(
                F.floor(F.col("log_offset") / 8).alias("__g"),
                canal_type.alias("__t"),
                opcode.alias("__c"),
            )
            .agg(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("log_offset", "payload")
                            )
                        ),
                        lambda x: x.payload,
                    ),
                    ",",
                ).alias("__rows")
            )
            .select(
                F.concat(
                    F.lit('{"type":"'),
                    F.col("__t"),
                    F.lit('","isDdl":false,"es":'),
                    F.col("__g").cast("string"),
                    F.lit(',"id":'),
                    F.col("__c").cast("string"),
                    F.lit(',"data":['),
                    F.col("__rows"),
                    F.lit("]}"),
                ).alias("value")
            )
        )
        env.write.mode("overwrite").parquet(_CNL_ORACLE_LOG)
        # epoch: all rows of window g came from original offsets [8g, 8g+8),
        # so floor(g*8/batch) is a deterministic ascending epoching (LWW is
        # global — epoch grouping affects replay batching only)
        decoded = decode_canal(
            spark.read.parquet(_CNL_ORACLE_LOG),
            epoch_expr=F.floor(
                (F.col("log_offset") / F.lit(4194304)).cast("long")
                * 8
                / F.lit(cfg.batch_size)
            ),
        )
        log = os.path.join(work, "log")
        write_envelope_changes(decoded, log)
        pipe = CdcPipeline(spark, log, os.path.join(work, "table"), num_buckets=8)
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _canal_oracle_sql(log_path: str) -> str:
    return _envelope_replay_oracle_sql(f"""
        env AS (
          SELECT * FROM read_parquet('{log_path}/*.parquet')
        ), dec AS (
          SELECT
            CAST(json_extract_string(value, '$.es') AS BIGINT) * 4194304
              + (CAST(json_extract_string(value, '$.id') AS BIGINT) % 4096)
                * 1024
              + (i % 1024) AS log_offset,
            CASE json_extract_string(value, '$.type')
              WHEN 'INSERT' THEN 'I' WHEN 'UPDATE' THEN 'U'
              WHEN 'DELETE' THEN 'D' END AS op,
            json_extract(value, '$.data[' || i || ']') AS payload
          FROM env, LATERAL (
            SELECT unnest(range(CAST(
              json_array_length(value, '$.data') AS BIGINT))) AS i
          ) t
          WHERE value IS NOT NULL
        )""")


_W2J_ORACLE_LOG = f"{_ORACLE_TMP}/w2j_log"


def _cdc_wal2json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wal2json front-end (Postgres logical decoding: transaction messages
    with parallel-array rows), hard-verified: the stream is grouped into
    wal2json v1 messages (one per (8-offset window, op); nextlsn = hex of
    the unique (window*4+opcode) id; upserts as columnnames/columnvalues
    in changegen's fixed key order, deletes as oldkeys), decoded by the
    zip_with row-rebuild kernel and replayed; the DuckDB oracle unnests
    the SAME raw messages (lateral range over json_array_length), parses
    the hex LSN with CAST('0x..'), re-derives the identical offset pack,
    and replays LWW positionally. p_badtype/p_malformed = 0 here — the
    invalid channel is covered by the other three envelope queries; this
    fixture isolates envelope fidelity (array zip, LSN math, delete
    keys)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        generate_changes,
    )
    from embulk_filter_expand_json_spark.sources.envelopes import (
        decode_wal2json,
        write_envelope_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="w2j_entry_")
    shutil.rmtree(_W2J_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
            p_malformed=0.0,
            p_badtype=0.0,
        )
        changes = generate_changes(spark, cfg)
        j = lambda p: F.get_json_object("payload", p)  # noqa: E731
        has_lang = j("$.lang").isNotNull()
        upsert_entry = F.concat(
            F.lit('{"kind":"'),
            F.when(F.col("op") == "I", F.lit("insert")).otherwise(
                F.lit("update")
            ),
            F.lit('","columnnames":'),
            F.when(
                has_lang,
                F.lit('["doc_id","tokens","n_tok","source","lang"]'),
            ).otherwise(F.lit('["doc_id","tokens","n_tok","source"]')),
            F.lit(',"columnvalues":["'),
            j("$.doc_id"),
            F.lit('",'),
            j("$.tokens"),
            F.lit(","),
            j("$.n_tok"),
            F.lit(',"'),
            j("$.source"),
            F.lit('"'),
            F.when(
                has_lang, F.concat(F.lit(',"'), j("$.lang"), F.lit('"'))
            ).otherwise(F.lit("")),
            F.lit("]}"),
        )
        delete_entry = F.concat(
            F.lit('{"kind":"delete","oldkeys":{"keynames":["doc_id"],'
                  '"keyvalues":["'),
            j("$.doc_id"),
            F.lit('"]}}'),
        )
        entry = F.when(F.col("op") == "D", delete_entry).otherwise(
            upsert_entry
        )
        opcode = (
            F.when(F.col("op") == "I", F.lit(0))
            .when(F.col("op") == "U", F.lit(1))
            .otherwise(F.lit(2))
        )
        env = (
            changes.select(
                F.floor(F.col("log_offset") / 8).alias("__g"),
                opcode.alias("__c"),
                F.struct("log_offset", entry.alias("e")).alias("__s"),
            )
            .groupBy("__g", "__c")
            .agg(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list("__s")), lambda x: x.e
                    ),
                    ",",
                ).alias("__rows")
            )
            .select(
                F.concat(
                    F.lit('{"change":['),
                    F.col("__rows"),
                    F.lit('],"nextlsn":"0/'),
                    F.hex(F.col("__g") * 4 + F.col("__c")),
                    F.lit('"}'),
                ).alias("value")
            )
        )
        env.write.mode("overwrite").parquet(_W2J_ORACLE_LOG)
        decoded = decode_wal2json(
            spark.read.parquet(_W2J_ORACLE_LOG),
            # offset = (g*4+c)*1024 + pos -> g = offset div 4096; the
            # window's rows came from original offsets [8g, 8g+8)
            epoch_expr=F.floor(
                F.floor(F.col("log_offset") / F.lit(4096))
                * 8
                / F.lit(cfg.batch_size)
            ),
        )
        log = os.path.join(work, "log")
        write_envelope_changes(decoded, log)
        pipe = CdcPipeline(spark, log, os.path.join(work, "table"), num_buckets=8)
        pipe.run()
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _wal2json_oracle_sql(log_path: str) -> str:
    """Positional replay of the raw wal2json messages: hex LSN via
    CAST('0x..' AS BIGINT), rows unnested laterally, doc_id/n_tok/source
    read positionally (changegen's fixed column order), deletes from
    oldkeys."""
    return f"""
        WITH env AS (
          SELECT * FROM read_parquet('{log_path}/*.parquet')
        ), dec AS (
          SELECT
            (CAST('0x' || split_part(
                 json_extract_string(value, '$.nextlsn'), '/', 1)
               AS BIGINT) * 4294967296
             + CAST('0x' || split_part(
                 json_extract_string(value, '$.nextlsn'), '/', 2)
               AS BIGINT)) * 1024 + (i % 1024) AS log_offset,
            CASE json_extract_string(value, '$.change[' || i || '].kind')
              WHEN 'insert' THEN 'I' WHEN 'update' THEN 'U'
              WHEN 'delete' THEN 'D' END AS op,
            CASE WHEN json_extract_string(
                   value, '$.change[' || i || '].kind') = 'delete'
              THEN json_extract_string(value,
                   '$.change[' || i || '].oldkeys.keyvalues[0]')
              ELSE json_extract_string(value,
                   '$.change[' || i || '].columnvalues[0]') END AS doc_id,
            CAST(json_extract_string(value,
                 '$.change[' || i || '].columnvalues[2]') AS INT) AS n_tok,
            json_extract_string(value,
                 '$.change[' || i || '].columnvalues[3]') AS source
          FROM env, LATERAL (
            SELECT unnest(range(CAST(
              json_array_length(value, '$.change') AS BIGINT))) AS i
          ) t
          WHERE value IS NOT NULL
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY log_offset DESC) AS rn
          FROM dec WHERE doc_id IS NOT NULL
        )
        SELECT doc_id, n_tok, source FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _cdc_quarantine_requeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter redrive lifecycle, hard-verified: replay a stream with
    an elevated bad-typed-payload rate under a quarantine table, then
    repair the quarantined rows (the producer fix: tokens:"oops" ->
    tokens:[]) and requeue them via CdcPipeline.requeue_quarantine —
    repaired winners apply under GLOBAL LWW (never stomping newer valid
    state), still-malformed rows stay quarantined, watermark pinned. The
    DuckDB oracle replays the log AS IF the rows had never been broken
    (the same fix applied in SQL, then the canonical LWW replay) —
    tests/test_quarantine_requeue.py pins the equivalent engine-vs-engine
    property plus stale/delete/evolution edges."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="rq_entry_")
    shutil.rmtree(_RQ_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
            p_badtype=0.05,
            p_malformed=0.01,
        )
        write_changes(spark, cfg, _RQ_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _RQ_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            quarantine_path=os.path.join(work, "dlq"),
        )
        pipe.run()
        res = pipe.requeue_quarantine(
            lambda df: df.withColumn(
                "payload",
                F.regexp_replace(
                    "payload", '"tokens":"oops"', '"tokens":[]'
                ),
            )
        )
        assert res["applied"] > 0, res  # the fixture must exercise the path
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _requeue_oracle_sql(log_path: str) -> str:
    """The redrive end-state equals a replay of the log with the producer
    fix applied up front: same valid/ranked algebra as _replay_oracle_sql
    over literal-replaced payloads."""
    return f"""
        WITH log AS (
          SELECT * FROM read_parquet('{log_path}/epoch=*/*.parquet')
        ), fixed AS (
          SELECT log_offset, op,
                 replace(payload, '"tokens":"oops"', '"tokens":[]') AS payload
          FROM log
        ), valid AS (
          SELECT log_offset, op,
                 json_extract_string(payload, '$.doc_id') AS doc_id,
                 CAST(json_extract_string(payload, '$.n_tok') AS INT) AS n_tok,
                 json_extract_string(payload, '$.source') AS source
          FROM fixed
          WHERE json_valid(payload)
            AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                 OR json_valid(json_extract_string(payload, '$.tokens')))
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY log_offset DESC) AS rn
          FROM valid WHERE doc_id IS NOT NULL
        )
        SELECT doc_id, n_tok, source FROM ranked WHERE rn = 1 AND op <> 'D'
    """


_DML_ORACLE_LOG = f"{_ORACLE_TMP}/dml_log"


def _cdc_dml_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML lifecycle (Delta UPDATE/DELETE parity), hard-verified:
    the cdc_replay_state pipeline runs to completion, then interactive DML
    edits the table in place — ``update_where`` rewrites every src3 row
    (both a string and an arithmetic assignment, each evaluated against
    the PRE-update row) and ``delete_where`` removes the updated rows
    whose shifted n_tok is divisible by 3. Both route through the staged
    MERGE machinery (bucket-local rewrite, feed, optimistic concurrency)
    without advancing the CDC watermark; the DuckDB oracle replays the
    log to final state and applies the same UPDATE-then-DELETE algebra in
    SQL (CASE assignment, IS NOT TRUE delete filter — SQL's NULL-keeps
    rule). tests/test_dml.py pins the engine contracts (watermark,
    pre-image feed rows, snapshot-isolated races, restore)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="dml_entry_")
    shutil.rmtree(_DML_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _DML_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _DML_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
        )
        pipe.run()
        t = pipe.table
        wm = t.manifest()["last_committed_epoch"]
        t.update_where(
            "source = 'src3'",
            {"source": "concat('q-', source)", "n_tok": "n_tok + 1000"},
        )
        t.delete_where("source = 'q-src3' AND n_tok % 3 = 0")
        assert t.manifest()["last_committed_epoch"] == wm, (
            "DML advanced the CDC watermark"
        )
        out = t.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _dml_oracle_sql(log_path: str) -> str:
    """The replay oracle wrapped with the same UPDATE-then-DELETE algebra:
    CASE applies both SET expressions against the pre-update row; the
    delete filter uses IS NOT TRUE so NULL predicates keep rows (SQL
    DELETE), matching Spark's where() keeping only TRUE matches."""
    return f"""
        WITH state AS ({_replay_oracle_sql(log_path)}),
        upd AS (
          SELECT doc_id,
                 CASE WHEN source = 'src3' THEN n_tok + 1000
                      ELSE n_tok END AS n_tok,
                 CASE WHEN source = 'src3' THEN 'q-' || source
                      ELSE source END AS source
          FROM state
        )
        SELECT doc_id, n_tok, source FROM upd
        WHERE (source = 'q-src3' AND n_tok % 3 = 0) IS NOT TRUE
    """


_EXP_ORACLE_LOG = f"{_ORACLE_TMP}/exp_log"


def _cdc_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations in the replay (DLT expect_or_drop parity),
    hard-verified: the standard pipeline runs with a drop-action
    expectation ``n_tok % 5 != 0`` (plus a warn that only counts) — each
    epoch's violating LWW winner is REJECTED pre-merge, so the doc keeps
    its prior state, while deletes are exempt. The DuckDB oracle replays
    the epoch-aware algebra: per-(doc, epoch) max-offset winner over the
    valid channel, winners surviving iff delete-or-predicate (NULL =
    violation, COALESCE false), then the latest surviving event per doc
    with delete suppression. tests/test_expectations.py pins the
    engine-side mechanics (warn/drop/fail actions, single-pass counts,
    replayability after a fail)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="exp_entry_")
    shutil.rmtree(_EXP_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _EXP_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _EXP_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            expectations=[
                ("tok_mod5", "n_tok % 5 != 0", "drop"),
                ("tok_small", "n_tok < 1000", "warn"),
            ],
        )
        metrics = pipe.run()
        assert any(
            m.expectation_failures.get("tok_mod5", 0) > 0 for m in metrics
        ), "fixture never fired the drop expectation"
        out = pipe.table.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _expectations_oracle_sql(log_path: str) -> str:
    """Epoch-aware replay with the drop-expectation algebra: the engine
    applies expectations to each epoch's LWW winner, so the oracle ranks
    winners per (doc, epoch), keeps delete winners plus predicate-passing
    upserts (NULL predicate = violation), and resolves the final state as
    the latest surviving event per doc."""
    return f"""
        WITH log AS (
          SELECT * FROM read_parquet(
            '{log_path}/epoch=*/*.parquet', hive_partitioning=1)
        ), valid AS (
          SELECT epoch, log_offset, op,
                 json_extract_string(payload, '$.doc_id') AS doc_id,
                 CAST(json_extract_string(payload, '$.n_tok') AS INT) AS n_tok,
                 json_extract_string(payload, '$.source') AS source
          FROM log
          WHERE json_valid(payload)
            AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                 OR json_valid(json_extract_string(payload, '$.tokens')))
        ), winners AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id, epoch ORDER BY log_offset DESC) AS rn
          FROM valid WHERE doc_id IS NOT NULL
        ), surviving AS (
          SELECT * FROM winners
          WHERE rn = 1
            AND (op = 'D' OR COALESCE(n_tok % 5 != 0, FALSE))
        ), final AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY epoch DESC) AS rn2
          FROM surviving
        )
        SELECT doc_id, n_tok, source FROM final WHERE rn2 = 1 AND op <> 'D'
    """


_WAP_ORACLE_LOG = f"{_ORACLE_TMP}/wap_log"


def _cdc_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish lifecycle (Iceberg branch + fast_forward
    parity), hard-verified end to end: the replay pipeline runs to
    completion on MAIN, then the same UPDATE-then-DELETE algebra as
    cdc_dml_state is staged on a BRANCH — main is asserted byte-unchanged
    while the branch carries the edit (the audit step) — and
    ``fast_forward`` republishes the branch commits onto main. The final
    main state must hash-equal the oracle that applies the DML directly:
    the branch detour is provably invisible in the result, which is the
    WAP contract. Engine-side mechanics (isolation, divergence rejection,
    GC pinning of branch files, feed continuity) are pinned by
    tests/test_branches.py; this query puts the publish path itself in
    the graded gate."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="wap_entry_")
    shutil.rmtree(_WAP_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _WAP_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _WAP_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
        )
        pipe.run()
        t = pipe.table
        head = t.manifest()["version"]
        pre_publish = t.read().select("doc_id", "n_tok", "source")

        b = t.create_branch("audit")
        b.update_where(
            "source = 'src3'",
            {"source": "concat('q-', source)", "n_tok": "n_tok + 1000"},
        )
        b.delete_where("source = 'q-src3' AND n_tok % 3 = 0")
        # audit: main untouched while the branch carries both edits
        assert t.manifest()["version"] == head, "branch write leaked to main"
        assert pre_publish.count() == t.read().count()

        r = t.fast_forward("audit")
        assert len(r["published_versions"]) == 2, r
        out = t.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_MI_ORACLE_LOG = f"{_ORACLE_TMP}/mi_log"


def _cdc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE INTO lifecycle (Delta MERGE grammar parity),
    hard-verified: after the standard replay, a deterministic source
    batch (ids i*37 — low ids match hot Zipf docs, ids past the doc-space
    ceiling are guaranteed new) merges with all three clauses at once:
    DELETE matched rows whose target n_tok is divisible by 7, UPDATE the
    rest under the out-of-order guard s.n_tok > t.n_tok, INSERT unmatched
    sources where n_tok % 3 != 0. The DuckDB oracle replays the identical
    clause algebra in SQL over the same replayed state; clause precedence
    (delete beats update), NULL-condition-is-false, and no-op rows are
    all in the compared multiset. tests/test_merge_into.py pins the
    engine-side contracts (watermark modes, feed images, race
    recompute)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="mi_entry_")
    shutil.rmtree(_MI_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _MI_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _MI_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
        )
        pipe.run()
        t = pipe.table
        batch = spark.range(100).select(
            F.format_string("doc-%08d", (F.col("id") * 37).cast("int"))
            .alias("doc_id"),
            (F.lit(7000) + F.col("id")).cast("int").alias("n_tok"),
            F.lit("batch").alias("source"),
        )
        t.merge_into(
            batch,
            when_matched_update={"n_tok": "s.n_tok", "source": "s.source"},
            when_matched_update_condition="s.n_tok > t.n_tok",
            when_matched_delete_condition="t.n_tok % 7 = 0",
            when_not_matched_condition="s.n_tok % 3 != 0",
        )
        out = t.read().select("doc_id", "n_tok", "source")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _merge_into_oracle_sql(log_path: str) -> str:
    """SQL replay of the three-clause merge over the replayed state:
    unmatched target rows pass through; matched rows delete when the
    delete condition is TRUE (IS TRUE: NULL keeps), else update under
    the guard; unmatched source rows insert under the insert filter."""
    return f"""
        WITH state AS ({_replay_oracle_sql(log_path)}),
        src AS (
          SELECT 'doc-' || lpad(CAST(i * 37 AS VARCHAR), 8, '0') AS doc_id,
                 CAST(7000 + i AS INT) AS n_tok,
                 'batch' AS source
          FROM generate_series(0, 99) g(i)
        ),
        matched AS (
          SELECT st.doc_id, st.n_tok, st.source,
                 s.n_tok AS s_n_tok, s.source AS s_source
          FROM state st JOIN src s USING (doc_id)
        )
        SELECT st.doc_id, st.n_tok, st.source
        FROM state st
        WHERE st.doc_id NOT IN (SELECT doc_id FROM src)
        UNION ALL
        SELECT doc_id,
               CASE WHEN s_n_tok > n_tok THEN s_n_tok ELSE n_tok END AS n_tok,
               CASE WHEN s_n_tok > n_tok THEN s_source ELSE source
                 END AS source
        FROM matched
        WHERE (n_tok % 7 = 0) IS NOT TRUE
        UNION ALL
        SELECT s.doc_id, s.n_tok, s.source
        FROM src s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM state)
          AND s.n_tok % 3 != 0
    """


_RW_ORACLE_LOG = f"{_ORACLE_TMP}/rw_log"


def _cdc_read_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-pruned range scan over a Z-ORDERED table, hard-verified: the
    standard replay runs with ``stats_columns`` on, the table is then
    z-order-compacted on (n_tok, source), and the result is
    ``read_where`` slices on BOTH dimensions union'd — file-level
    data skipping in the answer path, not just in a plan assertion. The
    query raises if the prune preview shows no files skipped on either
    dimension (so a silent stats regression fails loudly rather than
    degrading to full scans), and the DuckDB oracle is the plain WHERE
    over the replayed state — pruning must never change the answer."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="rw_entry_")
    shutil.rmtree(_RW_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _RW_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _RW_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=4,
            stats_columns=["n_tok", "source"],
        )
        pipe.run()
        t = pipe.table
        t.compact(target_files_per_bucket=8, cluster_by=["n_tok", "source"])
        for col, lo, hi in (("n_tok", 40, 120), ("source", "src2", "src4")):
            pv = t.prune_preview(col, lo, hi)
            if pv["base_files_read"] >= pv["base_files"]:
                raise AssertionError(
                    f"z-order stats skipped nothing on {col}: {pv}"
                )
        lowtok = t.read_where("n_tok", 40, 120)
        midsrc = t.read_where("source", "src2", "src4")
        out = (
            lowtok.select("doc_id", "n_tok", "source")
            .withColumn("slice", F.lit("n_tok"))
            .unionByName(
                midsrc.select("doc_id", "n_tok", "source")
                .withColumn("slice", F.lit("source"))
            )
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _read_where_oracle_sql(log_path: str) -> str:
    return f"""
        WITH state AS ({_replay_oracle_sql(log_path)})
        SELECT doc_id, n_tok, source, 'n_tok' AS slice
        FROM state WHERE n_tok BETWEEN 40 AND 120
        UNION ALL
        SELECT doc_id, n_tok, source, 'source' AS slice
        FROM state WHERE source BETWEEN 'src2' AND 'src4'
    """


_SCD2_ORACLE_LOG = f"{_ORACLE_TMP}/scd2_log"


def _cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history replica lifecycle, hard-verified: the standard
    changelog replay runs, then streaming/scd.py folds the change feed
    into interval rows (payload + valid_from/valid_to epoch + open flag)
    in TWO incremental applies (mid-run + catch-up) so the cross-batch
    interval closure is in the compared result, across the mid-stream
    'lang' evolution. The DuckDB oracle derives the same intervals
    straight from the materialized log: per-(epoch, doc) LWW winners
    (the feed oracle) + lead(epoch) per doc — upserts open intervals,
    the next change closes them, deletes open nothing.
    tests/test_scd2.py additionally pins as_of_epoch == source time
    travel for every epoch."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
    from embulk_filter_expand_json_spark.streaming.scd import Scd2Replica

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="scd2_entry_")
    shutil.rmtree(_SCD2_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _SCD2_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _SCD2_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
        )
        pipe.run()
        t = pipe.table
        scd = Scd2Replica(spark, t, os.path.join(work, "scd"))
        vmid = t.manifest()["version"] - 2
        if vmid > int(t.manifest().get("changes_valid_from", 0)):
            scd.apply(to_version=vmid)  # incremental first half
        scd.apply()
        hist = scd.history()
        lang = (
            F.col("lang")
            if "lang" in hist.columns
            else F.lit(None).cast("string")
        )
        out = hist.select(
            "doc_id", "n_tok", "source", lang.alias("lang"),
            "valid_from_epoch", "valid_to_epoch", "_scd_open",
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _scd2_oracle_sql(log_path: str) -> str:
    return f"""
        WITH feed AS ({_changefeed_oracle_sql(log_path)}),
        seq AS (
          SELECT *, lead(_commit_epoch) OVER (
                   PARTITION BY doc_id ORDER BY _commit_epoch
                 ) AS next_epoch
          FROM feed
        )
        SELECT doc_id, n_tok, source, lang,
               CAST(_commit_epoch AS BIGINT) AS valid_from_epoch,
               CAST(next_epoch AS BIGINT) AS valid_to_epoch,
               next_epoch IS NULL AS _scd_open
        FROM seq WHERE _change_type = 'upsert'
    """


_SCDF_ORACLE_LOG = f"{_ORACLE_TMP}/streamfeed_log"


def _streaming_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change data feed consumed as a STRUCTURED STREAMING source
    (Spark 4 Python DataSource API, streaming/feed_source.py): same
    deterministic replay as cdc_changefeed, but the feed rows arrive
    through readStream.format('snaptable_changes') with an availableNow
    trigger and a parquet sink — and must equal the same DuckDB oracle
    that recomputes the feed from the materialized log. Pins that the
    streaming offsets (manifest versions), per-file partitions, and
    pyarrow executor reads reproduce read_changes byte-true."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.feed_source import (
        SnapTableChangesDataSource,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="scdf_entry_")
    shutil.rmtree(_SCDF_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _SCDF_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _SCDF_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
        )
        pipe.run()
        spark.dataSource.register(SnapTableChangesDataSource)
        sink = os.path.join(work, "sink")
        q = (
            spark.readStream.format("snaptable_changes")
            .option("path", pipe.table.path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise RuntimeError("snaptable_changes availableNow query timed out")
        feed = spark.read.parquet(sink)
        lang = (
            F.col("lang")
            if "lang" in feed.columns
            else F.lit(None).cast("string")
        )
        out = feed.select(
            "_commit_epoch",
            "doc_id",
            "_change_type",
            "n_tok",
            "source",
            lang.alias("lang"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_AGG_ORACLE_LOG = f"{_ORACLE_TMP}/aggview_log"


def _incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, hard-verified: replay the deterministic
    change stream in two halves, syncing an IncrementalAggView between them
    — the second sync takes the INCREMENTAL path (changed-key point reads +
    delta fold, full_rebuild=False asserted), yet the final view must equal
    the DuckDB oracle's from-scratch GROUP BY over the SQL-replayed final
    state. This pins the core claim: delta maintenance from the change feed
    is exact, not approximate."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.aggview import (
        IncrementalAggView,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="aggview_entry_")
    shutil.rmtree(_AGG_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _AGG_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _AGG_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
        )
        # rebuild_dirty_fraction > 1 pins the INCREMENTAL delta path — the
        # code under verification here. At this fixture's size half the
        # epochs dirty most buckets, which the cost model would (correctly)
        # route to the cheaper auto-rebuild; that path has its own pin in
        # tests/test_aggview.py::test_view_wide_trickle_auto_rebuild_decision
        view = IncrementalAggView(
            spark,
            pipe.table,
            os.path.join(work, "view"),
            group_col="source",
            sum_cols=["n_tok"],
            rebuild_dirty_fraction=1.1,
        )
        n_epochs = len(pipe.available_epochs())
        pipe.run(max_epochs=max(n_epochs // 2, 1))
        view.sync()  # initial full aggregation
        pipe.run()  # remaining epochs
        r = view.sync()
        assert r["full_rebuild"] is False, "second sync must be incremental"
        out = view.read().select("source", "n_rows", "sum_n_tok")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_REPL_ORACLE_LOG = f"{_ORACLE_TMP}/replica_log"


def _derived_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-table replication, hard-verified: replay half the change
    stream, bootstrap a FILTERED+PROJECTED replica from the feed, replay
    the rest, catch the replica up incrementally (mode asserted) — the
    replica must equal the DuckDB oracle's filter/projection over the
    SQL-replayed FINAL state. Rows that updated out of the filter set
    between syncs must have been deleted downstream, or the hash differs."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
    from embulk_filter_expand_json_spark.streaming.replicate import replicate
    from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

    def keep_big(df: DataFrame) -> DataFrame:
        return df.filter(F.col("n_tok") >= 32).select(
            "doc_id",
            "n_tok",
            "source",
            (F.col("n_tok").cast("long") * 2).alias("dbl_tok"),
        )

    n_events = max(_events(spark, sf_dir).count() * 2, 2_000)
    work = tempfile.mkdtemp(prefix="replica_entry_")
    shutil.rmtree(_REPL_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=42,
        )
        write_changes(spark, cfg, _REPL_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _REPL_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
        )
        n_epochs = len(pipe.available_epochs())
        pipe.run(max_epochs=max(n_epochs // 2, 1))
        dst_path = os.path.join(work, "replica")
        r = replicate(spark, pipe.table, dst_path, transform=keep_big)
        assert r["mode"] == "bootstrap", r
        pipe.run()
        r = replicate(spark, pipe.table, dst_path, transform=keep_big)
        assert r["mode"] == "incremental", r
        dst = SnapTable(spark, dst_path)
        out = dst.read().select("doc_id", "n_tok", "source", "dbl_tok")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach
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


def _repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition metrics over documents plus planted
    self-doubled clones (every 40th doc's text twice) — organic prose has
    low duplicate-n-gram fractions, so the planting keeps the oracle
    non-vacuous. Pure Catalyst, zero shuffle."""
    from embulk_filter_expand_json_spark.functions.text import (
        repetition_metrics,
    )

    base = _documents(spark, sf_dir).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("text"),
    )
    uni = base.unionByName(planted)
    n_words, ttr, d2, d3 = repetition_metrics(F.col("text"))
    return uni.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        ttr,
        d2,
        d3,
    )


def _exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.dedup_text import exact_dedup

    return exact_dedup(_documents(spark, sf_dir))


def _exact_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group stats over documents plus planted exact clones
    (every 50th doc under id+1e6) — the organic table has no exact dups at
    small SF, so the planting keeps the oracle non-vacuous."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        exact_dup_groups,
    )

    base = _documents(spark, sf_dir).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    g = exact_dup_groups(base.unionByName(planted))
    return g.select("fp", "n_dups", "min_id", "max_id")


def _docs_with_planted_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents UNION deterministic planted near-dups: every 50th doc gets
    a clone (id+1_000_000) with ' zzz' appended — char-5-gram Jaccard ~0.98
    against its source, far above the 0.8 threshold, so LSH recall on the
    planted pairs is effectively guaranteed ((1-0.98^4)^16 ~ 1e-15)."""
    base = _documents(spark, sf_dir).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return base.unionByName(planted)


def _minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates -> EXACT shingle-Jaccard verification, over documents
    plus planted near-dups. Deterministic (fixed xxhash64 seeds) and
    hard-verified: the DuckDB oracle computes ALL-pairs exact Jaccard >= the
    threshold, so both LSH recall and the verifier must be right."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_lsh_pairs,
    )

    return minhash_lsh_pairs(
        _docs_with_planted_near_dups(spark, sf_dir),
        num_hashes=64,
        bands=16,
        threshold=0.8,
        verify="exact",
    )


def _ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs shingle-Jaccard near-dups (size-band candidate join,
    no probabilistic recall gap) over the same planted fixture as the
    MinHash query — same oracle, so the exact operator and the LSH verify
    must agree with DuckDB and (transitively) with each other."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        ngram_jaccard_all_pairs,
    )

    return ngram_jaccard_all_pairs(
        _docs_with_planted_near_dups(spark, sf_dir), threshold=0.8
    )


def _neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: MinHash pairs (exact-verified) -> connected
    components by iterative min-label propagation. The DuckDB oracle
    recomputes the same all-pairs Jaccard edges and resolves components
    with a recursive CTE (transitive closure -> min reachable id), so both
    the pair set AND the clustering must be right."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        neardup_components,
    )

    pairs = minhash_lsh_pairs(
        _docs_with_planted_near_dups(spark, sf_dir),
        num_hashes=64,
        bands=16,
        threshold=0.8,
        verify="exact",
    )
    return neardup_components(pairs)


def _docs_keep_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup ACTION: detect near-dup pairs, cluster them, keep
    each component's minimum id, drop the other members — the corpus a
    training run would actually consume. Oracle: the same recursive-CTE
    components, anti-joined in SQL."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        neardup_components,
    )

    docs = _docs_with_planted_near_dups(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.8, verify="exact"
    )
    comps = neardup_components(pairs)
    drop = comps.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(drop, on="doc_id", how="left_anti").select("doc_id")


def _docs_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted dedup action: cluster near-dups, keep each
    component's HIGHEST-quality member (ties -> lowest id) instead of the
    arbitrary min-id — what a curation pipeline actually wants. The
    planted ' zzz' clones usually outscore their originals (longer text,
    lower punctuation ratio), so the survivor set genuinely differs from
    docs_keep_representatives. Oracle: the same recursive-CTE components
    plus the SQL quality formula and a per-component argmax."""
    from embulk_filter_expand_json_spark.functions.text import quality_score
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        dedup_keep_best,
        minhash_lsh_pairs,
        neardup_components,
    )

    docs = _docs_with_planted_near_dups(spark, sf_dir).withColumn(
        "qscore", quality_score(F.col("text"))
    )
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.8, verify="exact"
    )
    comps = neardup_components(pairs)
    return dedup_keep_best(docs, comps, score_col="qscore").select("doc_id")


def _docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-LINE removal (C4/RefinedWeb boilerplate
    rule) over a planted multi-line fixture: every doc gains a unique
    'sig <id>' line; every third doc gains the same 'AD: subscribe now'
    boilerplate line. The operator must strip the boilerplate everywhere,
    keep the unique lines, and keep (possibly emptied) rows. Oracle:
    DuckDB aligned-unnest line explode + distinct-doc counts +
    order-preserving string_agg."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        remove_duplicate_lines,
    )

    docs = _documents(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("AD: subscribe now")
            ),
            F.concat(F.lit("sig "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return remove_duplicate_lines(docs, min_docs=2).select("doc_id", "text")


def _streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation operators running UNMODIFIED on a stream: documents
    (with the same planted PII as pii_redaction) fed as a 3-file
    readStream; per-micro-batch quality gate (>= 0.45, drops ~12% of fixture docs) -> PII redaction ->
    token count, appended to a parquet sink under availableNow. All
    stateless projections, so streaming output == the batch query — which
    is the DuckDB oracle (quality formula + redaction chain in SQL).
    This is the ingest shape where curation actually runs at 100 TB: on
    the arriving stream, not as a separate corpus pass."""
    import tempfile as _tf

    from embulk_filter_expand_json_spark.functions.text import (
        quality_score,
        whitespace_token_count,
    )
    from embulk_filter_expand_json_spark.operators.curation import redact_pii

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit(_PII_SUFFIX),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    work = _tf.mkdtemp(prefix="curstream_entry_")
    try:
        src = os.path.join(work, "in")
        _feed_time_ordered_files(spark, planted, src, 3, order_col="doc_id")
        stream = spark.readStream.schema(planted.schema).parquet(src)
        out = stream.filter(quality_score(F.col("text")) >= 0.45).select(
            "doc_id",
            redact_pii(F.col("text")).alias("clean_text"),
            whitespace_token_count(F.col("text")).cast("long").alias("n_tok"),
            quality_score(F.col("text")).alias("qscore"),
        )
        sink = os.path.join(work, "out")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise RuntimeError("streaming curation did not drain in 300s")
        res = spark.read.parquet(sink)
        return spark.createDataFrame(res.collect(), res.schema)  # detach
    finally:
        shutil.rmtree(work, ignore_errors=True)


_CAESAR_FROM = "abcdefghijklmnopqrstuvwxyz"
_CAESAR_TO = "bcdefghijklmnopqrstuvwxyza"


def _incremental_dedup_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a NEW batch (every-25th-doc clones with
    ' zzz' appended, plus Caesar-shifted fresh docs with ~0 shingle
    overlap) probed against the documents corpus via banded MinHash —
    new-vs-corpus candidates only, no corpus self-join, corpus text
    touched only for candidate verification. Exact-verified, so the
    DuckDB oracle is the full cross exact-Jaccard at the same
    threshold."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        minhash_dedup_against,
    )

    corpus = _documents(spark, sf_dir).select("doc_id", "text")
    clones = corpus.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    fresh = corpus.filter(F.col("doc_id") % 25 == 7).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.translate(F.col("text"), _CAESAR_FROM, _CAESAR_TO).alias("text"),
    )
    new_batch = clones.unionByName(fresh)
    return minhash_dedup_against(new_batch, corpus, threshold=0.8)


def _select_token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: best-quality docs first until 15,000
    whitespace tokens are consumed (greedy prefix over (qscore DESC,
    doc_id)). The engine runs the histogram + boundary-bucket plan — the
    full corpus path is filter-only, only ~1/resolution of rows pay a
    window — while the oracle replays the equivalent global cumulative
    window, so the distributed decomposition is verified bit-equal to the
    single-sort semantics."""
    from embulk_filter_expand_json_spark.functions.text import (
        quality_score,
        whitespace_token_count,
    )
    from embulk_filter_expand_json_spark.operators.curation import (
        select_token_budget,
    )

    scored = _documents(spark, sf_dir).select(
        "doc_id",
        quality_score(F.col("text")).alias("qscore"),
        whitespace_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    return select_token_budget(
        scored, budget=15_000, token_col="n_tok", score_col="qscore"
    )


def _exact_dedup_against_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup at ingest: a new batch (verbatim clones of
    every 25th corpus doc, near-miss ' zzz' variants, and a Caesar-shifted
    fresh set planted TWICE under two id ranges) probed against the
    corpus through its fingerprint table only — corpus text never read,
    new-batch fingerprints broadcast to the corpus-fp scan (zero corpus
    shuffle). Expected survivors: the variants (fp differs) and the
    min-id copy of each fresh doc (within-batch dedup); verbatim clones
    and the higher-id fresh copies drop."""
    from embulk_filter_expand_json_spark.functions.text import fingerprint
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        exact_dedup_against,
    )

    corpus = _documents(spark, sf_dir).select("doc_id", "text")
    caesar = F.translate(F.col("text"), _CAESAR_FROM, _CAESAR_TO)
    new_batch = (
        corpus.filter(F.col("doc_id") % 25 == 0)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 2_500_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
            )
        )
        .unionByName(
            corpus.filter(F.col("doc_id") % 25 == 7).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"),
                caesar.alias("text"),
            )
        )
        .unionByName(
            corpus.filter(F.col("doc_id") % 25 == 7).select(
                (F.col("doc_id") + 3_500_000).alias("doc_id"),
                caesar.alias("text"),
            )
        )
    )
    # the persisted-fingerprint-table analog (what a SnapTable would hold)
    corpus_fps = corpus.select(fingerprint(F.col("text")).alias("fp"))
    out = exact_dedup_against(new_batch, corpus_fps=corpus_fps)
    return out.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _dup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans (Lee et al. 2022 token-window
    formulation): 15-token windows occurring >= 2 times corpus-wide,
    merged into maximal per-doc spans. Windows are md5'd before the
    count shuffle so digests, not window texts, ride the exchange."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        duplicate_spans,
    )

    return duplicate_spans(_documents(spark, sf_dir), window=15)


def _docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al.'s removal action over the same spans: cut every
    duplicated token range from every document, keep surrounding prose,
    never drop rows (fully-duplicated docs survive with empty text)."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        remove_duplicate_spans,
    )

    return remove_duplicate_spans(_documents(spark, sf_dir), window=15)


def _simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidates (Hamming <= 3 via the pigeonhole chunk join) ->
    exact shingle-Jaccard >= 0.9 verification, RESTRICTED to the planted
    clone pairs (id_b = id_a + 1e6). Planted clones differ only in trailing
    whitespace: identical token stream (Hamming 0, candidacy guaranteed)
    but ~1 extra shingle (Jaccard ~0.99), so the oracle — the same planted
    pairs by exact SQL Jaccard — must agree exactly. The unrestricted
    organic sweep is pytest-pinned (tests/test_text_ops.py): Hamming(simhash)
    is a token-frequency similarity, not a shingle-Jaccard bound, so an
    all-pairs Jaccard oracle is not its contract."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )

    base = _documents(spark, sf_dir).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  ")).alias("text"),
    )
    un = base.unionByName(planted)
    cand = simhash_near_dup_pairs(un, max_hamming=3).select("id_a", "id_b")
    return ngram_jaccard_pairs(un, cand, threshold=0.9).filter(
        F.col("id_b") - F.col("id_a") == 1_000_000
    )


def _knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.similarity import cosine_topk

    emb = _embeddings(spark, sf_dir)
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    return cosine_topk(emb, q, k=10)


def _emb_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings UNION planted near-dup vectors: every 50th vector scaled
    by 1.0001 under a new id. Scaling preserves cosine (1.0) and the
    random-hyperplane signature (margins scale positively), so the planted
    pairs are guaranteed LSH-co-bucketed and dominate any organic pair (the
    synthetic embeddings' best non-self cosine is ~0.33)."""
    emb = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001))
        .cast("array<float>")
        .alias("embedding"),
    )
    return emb.unionByName(planted)


def _knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the FULL index lifecycle: build_lsh_index writes a
    sig-partitioned index, lsh_index_topk probes it partition-pruned. Nine
    planted scaled copies of the query vector (+ the query itself) form the
    exact top-10 at cosine 1.0, so the oracle is the brute-force top-10 over
    the union — probing must find them all."""
    from embulk_filter_expand_json_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
    )

    emb = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    planted = (
        spark.range(1, 10)
        .crossJoin(emb.filter(F.col("vec_id") == 0).select("embedding"))
        .select(
            (F.col("id") + 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x * (F.lit(1.0) + F.col("id") / F.lit(10000.0)),
            )
            .cast("array<float>")
            .alias("embedding"),
        )
    )
    un = emb.unionByName(planted)
    work = tempfile.mkdtemp(prefix="ann_index_")
    try:
        path = os.path.join(work, "index")
        build_lsh_index(un, dim=len(q), path=path, n_bits=4)
        out = lsh_index_topk(spark, path, q, k=10, n_bits=4, n_probes=8)
        return spark.createDataFrame(out.collect(), out.schema)  # detach
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _hash_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of documents: per-doc assignment
    (not just counts) so the oracle verifies every single label. md5-based,
    so DuckDB reproduces the exact bucket arithmetic."""
    from embulk_filter_expand_json_spark.operators.split import hash_split

    docs = _documents(spark, sf_dir).select("doc_id")
    return hash_split(docs, id_col="doc_id").select("doc_id", "split")


def _token_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-count quantiles (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation on the sorted set) —
    the corpus-profiling aggregate a curation pipeline reports."""
    from embulk_filter_expand_json_spark.functions.text import (
        lang_id,
        whitespace_token_count,
    )

    t = _documents(spark, sf_dir).select(
        lang_id(F.col("text")).alias("lang_pred"),
        whitespace_token_count(F.col("text")).cast("double").alias("n"),
    )
    q = t.groupBy("lang_pred").agg(
        F.expr("percentile(n, array(0.25, 0.5, 0.9))").alias("q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return q.select(
        "lang_pred",
        F.round(F.col("q")[0], 6).alias("q25"),
        F.round(F.col("q")[1], 6).alias("q50"),
        F.round(F.col("q")[2], 6).alias("q90"),
        "cnt",
    )


#: deterministic PII suffix planted on every 7th document so the redaction
#: query exercises every rule on real fixture rows (the synthetic corpus has
#: no organic PII); the oracle plants the identical suffix.
_PII_SUFFIX = (
    "@example.com or +1-555-0134 from 10.2.3.4 card 4111111111111111"
)


def _pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents: sequential regexp_replace chain (email
    -> phone -> card -> ipv4) plus per-kind counts measured on the
    sequentially redacted stream. Pure Catalyst — zero shuffle, rides the
    scan. Counts cast to long for oracle schema parity (DuckDB len() is
    BIGINT)."""
    from embulk_filter_expand_json_spark.operators.curation import (
        pii_counts,
        redact_pii,
    )

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit(_PII_SUFFIX),
        ),
    ).otherwise(F.col("text"))
    out = docs.select("doc_id", redact_pii(t).alias("clean_text"), *pii_counts(t))
    for c in ("n_email", "n_phone", "n_card", "n_ipv4"):
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


def _decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag train-split docs sharing any word
    5-gram with the test split (GPT-3/PaLM-style n-gram overlap rule). The
    test side's distinct gram set is broadcast; the train side never
    shuffles — the only exchange is the distinct over contaminated ids.
    Planted exact-dup clones in the fixture straddle the split boundary, so
    the hit set is non-trivially non-empty."""
    from embulk_filter_expand_json_spark.operators.curation import decontaminate
    from embulk_filter_expand_json_spark.operators.split import hash_split

    labeled = hash_split(_documents(spark, sf_dir).select("doc_id", "text"))
    corpus = labeled.filter(F.col("split") == "train").drop("split")
    bench = labeled.filter(F.col("split") == "test").drop("split")
    return decontaminate(corpus, bench, n=5).select("doc_id", "contaminated")


def _mix_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sample: per-source keep rates (the data-mixture /
    domain-reweighting step), md5-deterministic so membership is
    partitioning- and engine-independent. Zero shuffle — filter on the
    scan."""
    from embulk_filter_expand_json_spark.operators.curation import mix_sample

    rates = {"src0": 1.0, "src1": 0.25, "src2": 0.5, "src3": 0.75}
    return mix_sample(
        _documents(spark, sf_dir),
        rates,
        stratum_col="source",
        salt="mix42",
        default_rate=0.1,
    )


def _pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: greedy fill of 256-token training
    sequences within 8 md5 buckets (the per-output-shard packing a training
    pipeline runs before tokenization). The serial scan is per-bucket
    (applyInPandas group); the oracle replays the same greedy recurrence as
    a recursive CTE."""
    from embulk_filter_expand_json_spark.functions.text import (
        whitespace_token_count,
    )
    from embulk_filter_expand_json_spark.operators.curation import pack_sequences

    toks = _documents(spark, sf_dir).select(
        "doc_id",
        whitespace_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    return pack_sequences(
        toks, budget=256, token_col="n_tok", n_buckets=8, salt="pack42"
    )


def _training_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass — the operators composed the way a real
    training-data pipeline chains them: quality gate -> exact dedup (min-id
    keeps originals over the planted clones) -> per-doc token/lang stats.
    One hash shuffle total (the dedup groupBy); the quality filter and the
    stats stay inside the scan/post-agg projections under codegen."""
    from embulk_filter_expand_json_spark.functions.text import (
        bpe_ish_token_count,
        lang_id,
        quality_score,
        whitespace_token_count,
    )
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        exact_dedup,
    )

    base = _documents(spark, sf_dir).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    un = base.unionByName(planted)
    kept = un.filter(quality_score(F.col("text")) >= 0.5)
    ded = exact_dedup(kept)
    t = F.col("text")
    return ded.select(
        "doc_id",
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        lang_id(t).alias("lang_pred"),
    )


def _curation_neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation chain as one verified plan: quality gate ->
    MinHash/LSH near-dup pairs -> connected components -> keep the
    highest-quality member per cluster -> per-doc token/lang stats.
    Composition rules that keep it one-pass at scale: the quality score
    is computed ONCE (it feeds both the gate and the keep-best argmax),
    the gated corpus is materialized ONCE (localCheckpoint) so the pair
    miner's shingling and the final anti-join read the same cached rows
    instead of re-running the scan+filter, and pair mining happens on
    the GATED corpus (never shingle docs the gate already dropped).
    Oracle: same SQL quality formula + kept-restricted exact-Jaccard
    pairs + recursive-CTE closure + per-component argmax + stats."""
    from embulk_filter_expand_json_spark.functions.text import (
        bpe_ish_token_count,
        lang_id,
        quality_score,
        whitespace_token_count,
    )
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        dedup_keep_best,
        minhash_lsh_pairs,
        neardup_components,
    )

    docs = _docs_with_planted_near_dups(spark, sf_dir).withColumn(
        "qscore", quality_score(F.col("text"))
    )
    kept = docs.filter(F.col("qscore") >= 0.5).localCheckpoint()
    pairs = minhash_lsh_pairs(
        kept, num_hashes=64, bands=16, threshold=0.8, verify="exact"
    )
    comps = neardup_components(pairs)
    surv = dedup_keep_best(kept, comps, score_col="qscore")
    t = F.col("text")
    return surv.select(
        "doc_id",
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        lang_id(t).alias("lang_pred"),
    )


def _knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the IVF lifecycle (the second scale path next to
    knn_lsh): build_ivf_index trains sample k-means centroids and writes a
    list-partitioned index; ivf_index_topk probes the n_probes nearest
    lists partition-pruned. Same planted fixture as knn_lsh — spherical
    (cosine) assignment is scale-invariant, so the nine scaled clones
    provably share the query's list — hence the same brute-force oracle."""
    from embulk_filter_expand_json_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    planted = (
        spark.range(1, 10)
        .crossJoin(emb.filter(F.col("vec_id") == 0).select("embedding"))
        .select(
            (F.col("id") + 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x * (F.lit(1.0) + F.col("id") / F.lit(10000.0)),
            )
            .cast("array<float>")
            .alias("embedding"),
        )
    )
    un = emb.unionByName(planted)
    work = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        path = os.path.join(work, "index")
        build_ivf_index(un, dim=len(q), path=path, n_lists=16, max_sample=4000)
        out = ivf_index_topk(spark, path, q, k=10, n_probes=4)
        return spark.createDataFrame(out.collect(), out.schema)  # detach
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _knn_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH ANN through the IVF index: top-10 for three queries in ONE
    pruned scan (ivf_index_topk_many) — the realistic serving shape, where
    per-query Spark jobs would pay the scheduling floor N times. Each query
    vec (0,1,2) gets nine planted scaled clones under 1e6*(q+1)+i; spherical
    assignment co-lists them with their query, so each per-query top-10 is
    the clone family at cosine 1.0 — which is what the brute-force oracle
    computes per query."""
    from embulk_filter_expand_json_spark.operators.ivf import (
        build_ivf_index,
        ivf_index_topk_many,
    )

    emb = _embeddings(spark, sf_dir).select("vec_id", "embedding")
    qrows = emb.filter(F.col("vec_id").isin([0, 1, 2])).orderBy("vec_id").collect()
    queries = [list(r["embedding"]) for r in qrows]
    planted = None
    for qi in range(3):
        p = (
            spark.range(1, 10)
            .crossJoin(emb.filter(F.col("vec_id") == qi).select("embedding"))
            .select(
                (F.col("id") + 1_000_000 * (qi + 1)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (F.lit(1.0) + F.col("id") / F.lit(10000.0)),
                )
                .cast("array<float>")
                .alias("embedding"),
            )
        )
        planted = p if planted is None else planted.unionByName(p)
    un = emb.unionByName(planted)
    work = tempfile.mkdtemp(prefix="ivf_batch_")
    try:
        path = os.path.join(work, "index")
        build_ivf_index(un, dim=len(queries[0]), path=path, n_lists=16,
                        max_sample=4000)
        out = ivf_index_topk_many(
            spark, path, queries, k=10, n_probes=4
        ).select(
            F.col("query_id").cast("long").alias("query_id"),
            "vec_id",
            "cosine",
        )
        return spark.createDataFrame(out.collect(), out.schema)  # detach
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) over events: one shuffle on
    user_id; the per-session agg reuses that partitioning (single-Exchange
    plan pinned in tests/test_sessions_windowed.py). Integer-only outputs
    (epoch micros) so the hash compare is exact."""
    from embulk_filter_expand_json_spark.operators.sessions import (
        session_stats,
    )

    return session_stats(_events(spark, sf_dir), gap_minutes=30)


def _sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-pass sessionization (events shuffled by
    (user, 1h-chunk); boundary sessions stitched over per-chunk summaries).
    Must be indistinguishable from the plain sessionizer — it shares
    sessionize_events' oracle, and the 1-hour chunk against a 30-minute gap
    makes cross-chunk stitching the common case, not a corner."""
    from embulk_filter_expand_json_spark.operators.sessions import (
        session_stats_chunked,
    )

    return session_stats_chunked(
        _events(spark, sf_dir), gap_minutes=30, chunk_hours=1
    )


def _feed_time_ordered_files(
    spark: SparkSession, df: DataFrame, src: str, n_files: int,
    order_col: str = "event_id",
) -> None:
    """Write df as n_files event-time-ordered parquet files (order_col
    range slices; the generator's event_id is ts-ordered) — the
    arrival-order contract the stateful operators document. Slicing uses
    the ACTUAL [min, max] of order_col (half-open ranges covering it
    completely), so sparse/non-zero-based ids lose no rows."""
    import glob as _glob

    os.makedirs(src, exist_ok=True)
    lo, hi = df.agg(
        F.min(order_col), F.max(order_col)
    ).first()
    span = int(hi) - int(lo) + 1
    for i in range(n_files):
        start = int(lo) + i * span // n_files
        stop = int(lo) + (i + 1) * span // n_files
        stage = os.path.join(src, f"_stage{i}")
        (
            df.filter(
                (F.col(order_col) >= start) & (F.col(order_col) < stop)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"{i:02d}.parquet"))
        shutil.rmtree(stage)


def _streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (1h) event-type counts through Structured Streaming:
    readStream over a 3-file feed, watermarked window agg, complete-mode
    memory sink, availableNow. The final complete-mode table equals the
    batch GROUP BY — which is the DuckDB oracle."""
    from embulk_filter_expand_json_spark.streaming.windowed import (
        window_start_us,
        windowed_counts,
    )

    ev = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="wstream_entry_")
    try:
        src = os.path.join(work, "in")
        _feed_time_ordered_files(spark, ev, src, 3)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _drop_view_if_exists(spark, "wc_entry")
        q = (
            windowed_counts(stream, window="1 hour", watermark="30 minutes")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("wc_entry")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish in 300s "
                               "- a partial sink table must not be compared")
        out = window_start_us(spark.table("wc_entry"))
        res = spark.createDataFrame(out.collect(), out.schema)  # detach
        spark.catalog.dropTempView("wc_entry")
        return res
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _drop_view_if_exists(spark: SparkSession, name: str) -> None:
    """A prior failed run can leave the memory sink's temp view behind;
    starting a new stream with the same queryName would then collide."""
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass


def _streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming sessionization (F.session_window): 30-min-gap
    sessions merged incrementally across a 3-file availableNow feed,
    complete-mode final table == the batch gap-sessionizer == the SQL
    oracle (boundary semantics coincide on micro-timestamped data — no
    exact-gap pairs exist in the testdata, checked up to sf0.1)."""
    from embulk_filter_expand_json_spark.streaming.windowed import (
        session_windows,
    )

    ev = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="sess_stream_entry_")
    try:
        src = os.path.join(work, "in")
        _feed_time_ordered_files(spark, ev, src, 3)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _drop_view_if_exists(spark, "sw_entry")
        q = (
            session_windows(stream, gap_minutes=30)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sw_entry")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish in 300s "
                               "- a partial sink table must not be compared")
        out = spark.table("sw_entry")
        res = spark.createDataFrame(out.collect(), out.schema)  # detach
        spark.catalog.dropTempView("sw_entry")
        return res
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _stateful_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts via applyInPandasWithState:
    lag state carried ACROSS micro-batches (4-file time-ordered feed, one
    file per trigger), then a batch rollup of the emitted transition log.
    Oracle: LAG window + GROUP BY in SQL — cross-batch state must
    reproduce exactly what a global batch LAG sees."""
    from embulk_filter_expand_json_spark.streaming.stateful import (
        transitions_stateful,
    )

    ev = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="tstream_entry_")
    try:
        src = os.path.join(work, "in")
        _feed_time_ordered_files(spark, ev, src, 4)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _drop_view_if_exists(spark, "tr_entry")
        q = (
            transitions_stateful(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("tr_entry")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish in 300s "
                               "- a partial sink table must not be compared")
        out = (
            spark.table("tr_entry")
            .groupBy("prev_type", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        res = spark.createDataFrame(out.collect(), out.schema)  # detach
        spark.catalog.dropTempView("tr_entry")
        return res
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_filter_expand_json_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    un = _emb_with_planted(spark, sf_dir)
    dim = len(un.first()["embedding"])
    return embedding_near_dup_pairs(un, dim=dim, threshold=0.99)


def _semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): embedding-space
    near-dup pairs (LSH-bucketed cosine >= 0.99) -> connected components
    (pointer-jumping min-label) -> keep each component's minimum id.
    Composition of three already-verified operators; the oracle replays
    the chain with a full cross cosine join + recursive closure."""
    from embulk_filter_expand_json_spark.operators.dedup_text import (
        neardup_components,
    )
    from embulk_filter_expand_json_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    un = _emb_with_planted(spark, sf_dir)
    dim = len(un.first()["embedding"])
    pairs = embedding_near_dup_pairs(un, dim=dim, threshold=0.99).select(
        "id_a", "id_b"
    )
    comp = neardup_components(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias("vec_id")
    )
    return un.select("vec_id").join(drop, "vec_id", "left_anti")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def _streaming_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay as cdc_replay_state but driven through the Structured
    Streaming front-end (readStream -> foreachBatch -> idempotent MERGE).
    Hard-verified against the same SQL replay oracle over its own
    materialized log; cross-validated against the pure-Python oracle in
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
    shutil.rmtree(_STREAM_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=4_000, n_docs=200, batch_size=1_000, seed=42
        )
        write_changes(spark, cfg, _STREAM_ORACLE_LOG)
        q = run_streaming_apply(
            spark,
            changes_path=_STREAM_ORACLE_LOG,
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


def _cdc_enrich_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal enrichment end-to-end: replay a change stream into a
    SnapTable with the change feed on, then ask — for a deterministic
    probe set of doc_ids, just after EVERY merge commit — what each doc's
    row looked like at that instant (streaming/temporal.py enrich_as_of:
    change feed + broadcast commit history + the single-exchange as-of
    join; no base-file scans). Declaring lang upfront keeps version
    numbering deterministic (no evolve commits), and probe times are each
    commit's wall clock + epsilon, so the oracle can replay the same
    question as max-offset-per-(doc, epoch-prefix) over the materialized
    log — deleted-at-that-instant docs carry NULL payloads on both
    sides."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline
    from embulk_filter_expand_json_spark.streaming.temporal import enrich_as_of

    n_events = max(_events(spark, sf_dir).count(), 2_000)
    work = tempfile.mkdtemp(prefix="asof_entry_")
    shutil.rmtree(_ASOF_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=21,
        )
        write_changes(spark, cfg, _ASOF_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _ASOF_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            changelog=True,
            expected_columns=["lang"],
        )
        pipe.run()
        t = pipe.table

        ids = sorted(
            r["doc_id"]
            for r in t.read_changes(0).select("doc_id").distinct().collect()
        )[:50] + ["doc-miss"]
        merges = [
            (int(h["summary"]["epoch"]), float(h["committed_at"]))
            for h in t.history()
            if h["summary"].get("op") == "merge"
        ]
        events = spark.createDataFrame(
            [(e, d, ts + 1e-4) for e, ts in merges for d in ids],
            "probe_epoch long, doc_id string, ts double",
        )
        out = enrich_as_of(events, t, on="doc_id", event_time="ts").select(
            "probe_epoch", "doc_id", "n_tok", "source", "lang"
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _top_ngrams_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: the 10 most frequent word trigrams per language
    (operators/curation.py top_ngrams — salted-tournament top-k, so no
    language's full distinct-gram distribution ever lands on one task).
    Deterministic tie order (count desc, gram asc) makes the oracle's
    global window bit-comparable."""
    from embulk_filter_expand_json_spark.operators.curation import top_ngrams

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return top_ngrams(docs, n=3, k=10, by="lang", min_count=2)


def _cdc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter table after a full replay: run the engine with
    quarantine_path set over a deterministic change stream with cranked
    corruption rates, return the quarantine SnapTable's contents. The
    oracle replays the generator's plant rules in SQL over the same
    materialized log — reason precedence matches the engine (payload NULL
    → null_merge_key; unparseable → malformed_document; bad tokens type →
    cast_error; else missing doc_id → null_merge_key)."""
    from embulk_filter_expand_json_spark.sources.changegen import (
        ChangeGenConfig,
        write_changes,
    )
    from embulk_filter_expand_json_spark.streaming.pipeline import CdcPipeline

    n_events = max(_events(spark, sf_dir).count(), 2_000)
    work = tempfile.mkdtemp(prefix="dlq_entry_")
    shutil.rmtree(_DLQ_ORACLE_LOG, ignore_errors=True)
    try:
        cfg = ChangeGenConfig(
            n_events=n_events,
            n_docs=max(n_events // 20, 50),
            batch_size=max(n_events // 4, 500),
            seed=13,
            p_malformed=0.01,
            p_badtype=0.02,
        )
        write_changes(spark, cfg, _DLQ_ORACLE_LOG)
        pipe = CdcPipeline(
            spark,
            _DLQ_ORACLE_LOG,
            os.path.join(work, "table"),
            num_buckets=8,
            quarantine_path=os.path.join(work, "dlq"),
        )
        pipe.run()
        out = pipe.quarantine.read().select("log_offset", "op", "_invalid_reason")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _expand_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine (dead-letter) policy for the invalid-record channel:
    expand_json_split routes bad rows to a side output with a reason
    instead of dropping (skip) or halting (abort) — the third policy a
    CDC ingest needs (operators/expand.py flag_invalid_records). Fixture:
    the shared every-17th-row BROKEN timestamp (cast_error) plus an
    every-31st-row malformed-JSON overlay (malformed_document, which wins
    when both fire). Returns the quarantined side; the valid side of the
    same split is pinned equal to the skip channel by pytest."""
    from embulk_filter_expand_json_spark.operators.expand import (
        expand_json_split,
    )

    src = _ts_json_doc(spark, sf_dir, with_fraction=False)
    eid = F.col("event_id")
    src = src.withColumn(
        "payload",
        F.when(eid % 31 == 0, F.lit('{"t": broken')).otherwise(
            F.col("payload")
        ),
    )
    _valid, quar = expand_json_split(
        src,
        {
            "json_column_name": "payload",
            "expanded_columns": [
                {
                    "name": "t",
                    "type": "timestamp",
                    "format": "%Y-%m-%d %H:%M:%S",
                    "timezone": "Asia/Tokyo",
                },
                {"name": "j", "type": "json"},
            ],
        },
        mode="catalyst",
    )
    return quar.select("event_id", "_invalid_reason")


def _asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal lookup join: every purchase event enriched with the same
    user's nearest click at-or-before it — the as-of lookup a CDC consumer
    runs against time-versioned dimension state. asof_join is the
    single-shuffle union-merge operator (operators/asof.py: one key-hash
    exchange, no range-join explosion); the oracle is DuckDB's NATIVE
    ``ASOF LEFT JOIN``, so the two implementations are fully independent.
    (user_id, ts) is unique in the events table, satisfying the operator's
    unique-(key,time) right-side contract."""
    from embulk_filter_expand_json_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(purchases, clicks, on="user_id", left_time="ts").select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_r").alias("click_ts"),
        "click_value",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: expansion operator on sf0.001 events (drop-source mode)."""
    return _expand_props_long(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "expand_props_long": _expand_props_long,
        "expand_props_long_arrow": _expand_props_long_arrow,
        "expand_props_keep_and_missing": _expand_props_keep_and_missing,
        "expand_props_types": _expand_props_types,
        "expand_ts_json_arrow": _expand_ts_json_arrow,
        "expand_ts_century": _expand_ts_century,
        "expand_ts_json_catalyst": _expand_ts_json_catalyst,
        "expand_struct_source": _expand_struct_source,
        "expand_tail_fns": _expand_tail_fns,
        "expand_lineitem_json": _expand_lineitem_json,
        "lww_dedup_window": _lww_window,
        "lww_dedup_agg": _lww_agg,
        "lww_dedup_salted": _lww_salted,
        "lww_dedup_keyjoin": _lww_keyjoin,
        "cdc_replay_state": _cdc_replay_state,
        "cdc_changefeed": _cdc_changefeed,
        "cdc_debezium_ingest": _cdc_debezium_ingest,
        "cdc_maxwell_ingest": _cdc_maxwell_ingest,
        "cdc_canal_ingest": _cdc_canal_ingest,
        "cdc_wal2json_ingest": _cdc_wal2json_ingest,
        "cdc_quarantine_requeue": _cdc_quarantine_requeue,
        "cdc_dml_state": _cdc_dml_state,
        "cdc_wap_publish": _cdc_wap_publish,
        "cdc_expectations": _cdc_expectations,
        "cdc_merge_into": _cdc_merge_into,
        "cdc_read_where": _cdc_read_where,
        "cdc_scd2_history": _cdc_scd2_history,
        "streaming_changefeed": _streaming_changefeed,
        "incremental_agg_view": _incremental_agg_view,
        "derived_replica": _derived_replica,
        "streaming_replay_state": _streaming_replay_state,
        "doc_fingerprint": _doc_fingerprint,
        "token_stats": _token_stats,
        "quality_scores": _quality_scores,
        "repetition_scores": _repetition_scores,
        "lang_id": _lang_id,
        "exact_dedup_docs": _exact_dedup_docs,
        "exact_dup_stats": _exact_dup_stats,
        "minhash_near_dups": _minhash_near_dups,
        "ngram_jaccard_dups": _ngram_jaccard_dups,
        "neardup_components": _neardup_components,
        "docs_keep_representatives": _docs_keep_representatives,
        "docs_keep_best_quality": _docs_keep_best_quality,
        "docs_line_dedup": _docs_line_dedup,
        "dup_spans_docs": _dup_spans_docs,
        "docs_span_dedup": _docs_span_dedup,
        "incremental_dedup_newbatch": _incremental_dedup_newbatch,
        "exact_dedup_against_newbatch": _exact_dedup_against_newbatch,
        "select_token_budget_docs": _select_token_budget_docs,
        "streaming_curation": _streaming_curation,
        "simhash_near_dups": _simhash_near_dups,
        "knn_bruteforce": _knn_bruteforce,
        "knn_lsh": _knn_lsh,
        "knn_ivf": _knn_ivf,
        "knn_ivf_batch": _knn_ivf_batch,
        "embedding_near_dups": _embedding_near_dups,
        "semdedup_embeddings": _semdedup_embeddings,
        "sessionize_events": _sessionize_events,
        "sessionize_chunked": _sessionize_chunked,
        "asof_prior_click": _asof_prior_click,
        "expand_quarantine": _expand_quarantine,
        "cdc_quarantine": _cdc_quarantine,
        "top_ngrams_by_lang": _top_ngrams_by_lang,
        "cdc_enrich_asof": _cdc_enrich_asof,
        "training_pipeline_docs": _training_pipeline_docs,
        "curation_neardup_pipeline": _curation_neardup_pipeline,
        "hash_split_docs": _hash_split_docs,
        "token_quantiles_by_lang": _token_quantiles_by_lang,
        "pii_redaction": _pii_redaction,
        "decontaminate_docs": _decontaminate_docs,
        "mix_sample_docs": _mix_sample_docs,
        "pack_docs": _pack_docs,
        "streaming_windowed_agg": _streaming_windowed_agg,
        "streaming_sessionize": _streaming_sessionize,
        "stateful_transitions": _stateful_transitions,
    }


def oracle_sql() -> dict[str, str]:
    expand_long = """
        SELECT event_id, ts, user_id, event_type, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """
    # shared CTE text for the planted-near-dup document union + shingle sets
    docs_shingles = """
        WITH uni AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text || '{suffix}' AS text
          FROM documents WHERE doc_id % 50 = 0
        ), sh AS (
          SELECT doc_id,
                 list_distinct(
                   list_transform(generate_series(1, length(norm) - 4),
                                  i -> norm[i:i+4])) AS s
          FROM (SELECT doc_id,
                       lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
                FROM uni)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b
          ON a.doc_id < b.doc_id
         AND least(len(a.s), len(b.s))::DOUBLE
             >= {threshold} * greatest(len(a.s), len(b.s))
         {extra_pred}
        WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s))) >= {threshold}
    """
    # shared CTE chain for the Lee-et-al exact-substring span queries:
    # 15-token windows md5'd, counted corpus-wide, >=2 occurrences marked,
    # overlapping windows merged into maximal spans via gaps-and-islands
    span_cte = r"""
          w AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS ws
            FROM documents
          ), t AS (
            SELECT doc_id, ws FROM w WHERE len(ws) >= 15
          ), wi AS (
            SELECT doc_id, ws,
                   unnest(range(1, len(ws) - 13)) AS i
            FROM t
          ), wins AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(ws[i:i+14], ' ')) AS g
            FROM wi
          ), dup AS (
            SELECT g FROM wins GROUP BY g HAVING count(*) >= 2
          ), occ AS (
            SELECT doc_id, pos FROM wins WHERE g IN (SELECT g FROM dup)
          ), isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id
                                                  ORDER BY pos) + 15
                        THEN 1 ELSE 0 END AS f
            FROM occ
          ), isl2 AS (
            SELECT doc_id, pos,
                   sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
          ), spans AS (
            SELECT doc_id, min(pos)::BIGINT AS span_start,
                   (max(pos) + 14)::BIGINT AS span_end
            FROM isl2 GROUP BY doc_id, island
          )
    """
    ts_json = """
        SELECT event_id,
               epoch_us(timezone('Asia/Tokyo',
                 make_timestamp(2024, 3,
                   (event_id % 28 + 1)::INT, (event_id % 24)::INT,
                   (event_id % 60)::INT, ((event_id * 7) % 60)::INT)))
               {frac_us} AS t_us,
               '{{"a":"' || event_type || '","b":' || user_id || '}}' AS j
        FROM events WHERE event_id % 17 <> 0
    """
    return {
        "expand_props_long": expand_long,
        "expand_props_long_arrow": expand_long,
        "expand_ts_json_arrow": ts_json.format(frac_us="+ (event_id % 1000000)"),
        "expand_ts_json_catalyst": ts_json.format(frac_us=""),
        "expand_ts_century": """
            WITH g AS (
              SELECT event_id,
                     CASE WHEN event_id % 100 <= 68
                          THEN 2000 + event_id % 100
                          ELSE 1900 + event_id % 100 END AS gy
              FROM events
            )
            SELECT event_id,
                   epoch_us(make_date(
                     (1900 + (event_id % 2) * 100 + event_id % 100)::INT,
                     (event_id % 12 + 1)::INT,
                     (event_id % 28 + 1)::INT)::TIMESTAMP) AS cd_us,
                   epoch_us((make_date(gy::INT, 1, 4)
                     + ((event_id % 52) * 7 + (event_id % 7)
                        - (isodow(make_date(gy::INT, 1, 4)) - 1))::INT
                    )::TIMESTAMP) AS gd_us
            FROM g WHERE event_id % 23 <> 0
        """,
        "expand_struct_source": """
            SELECT event_id, user_id AS uid, event_type AS etype FROM events
        """,
        "expand_tail_fns": """
            SELECT event_id,
                   (event_id % 5 + 1) AS a_len,
                   list_aggregate(
                     list_transform(generate_series(1, (event_id % 5 + 1)::INT),
                                    x -> x::DOUBLE),
                     'sum') AS a_sum,
                   event_type || 'k' || '-' || (event_id % 7) AS tag_cat,
                   '["' || event_type || '","k",' || (event_id % 7) || ']'
                     AS tag_app
            FROM events
        """,
        "cdc_replay_state": _replay_oracle_sql(_CDC_ORACLE_LOG),
        "cdc_changefeed": _changefeed_oracle_sql(_CDF_ORACLE_LOG),
        "cdc_debezium_ingest": _debezium_oracle_sql(_DBZ_ORACLE_LOG),
        "cdc_maxwell_ingest": _maxwell_oracle_sql(_MXW_ORACLE_LOG),
        "cdc_canal_ingest": _canal_oracle_sql(_CNL_ORACLE_LOG),
        "cdc_wal2json_ingest": _wal2json_oracle_sql(_W2J_ORACLE_LOG),
        "cdc_quarantine_requeue": _requeue_oracle_sql(_RQ_ORACLE_LOG),
        "cdc_dml_state": _dml_oracle_sql(_DML_ORACLE_LOG),
        "cdc_wap_publish": _dml_oracle_sql(_WAP_ORACLE_LOG),
        "cdc_expectations": _expectations_oracle_sql(_EXP_ORACLE_LOG),
        "cdc_merge_into": _merge_into_oracle_sql(_MI_ORACLE_LOG),
        "cdc_read_where": _read_where_oracle_sql(_RW_ORACLE_LOG),
        "cdc_scd2_history": _scd2_oracle_sql(_SCD2_ORACLE_LOG),
        "streaming_changefeed": _changefeed_oracle_sql(_SCDF_ORACLE_LOG),
        "incremental_agg_view": f"""
            WITH state AS ({_replay_oracle_sql(_AGG_ORACLE_LOG)})
            SELECT source, count(*) AS n_rows,
                   CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS sum_n_tok
            FROM state GROUP BY source
        """,
        "derived_replica": f"""
            WITH state AS ({_replay_oracle_sql(_REPL_ORACLE_LOG)})
            SELECT doc_id, n_tok, source,
                   CAST(n_tok AS BIGINT) * 2 AS dbl_tok
            FROM state WHERE n_tok >= 32
        """,
        "streaming_replay_state": _replay_oracle_sql(_STREAM_ORACLE_LOG),
        "expand_lineitem_json": """
            SELECT l_suppkey, l_orderkey AS ok,
                   CAST(l_linenumber AS BIGINT) AS ln,
                   l_returnflag AS rf, l_linestatus AS ls
            FROM lineitem
        """,
        "minhash_near_dups": docs_shingles.format(
            suffix=" zzz", threshold=0.8, extra_pred=""
        ),
        "ngram_jaccard_dups": docs_shingles.format(
            suffix=" zzz", threshold=0.8, extra_pred=""
        ),
        # connected components over the same all-pairs edge set: recursive
        # transitive closure, then min reachable id per node
        "neardup_components": (
            # MATERIALIZED: without it DuckDB inlines the expensive all-pairs CTE
        # into EVERY recursion iteration (hours at sf0.1 instead of minutes)
        "WITH RECURSIVE pairs AS MATERIALIZED ("
            + docs_shingles.format(suffix=" zzz", threshold=0.8, extra_pred="")
            + """
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(node, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            )
            SELECT node AS doc_id, min(label) AS component
            FROM reach GROUP BY node
            """
        ),
        "docs_keep_representatives": (
            # MATERIALIZED: without it DuckDB inlines the expensive all-pairs CTE
        # into EVERY recursion iteration (hours at sf0.1 instead of minutes)
        "WITH RECURSIVE pairs AS MATERIALIZED ("
            + docs_shingles.format(suffix=" zzz", threshold=0.8, extra_pred="")
            + """
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(node, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ), comp AS (
              SELECT node, min(label) AS component FROM reach GROUP BY node
            ), uni2 AS (
              SELECT doc_id FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id
              FROM documents WHERE doc_id % 50 = 0
            )
            SELECT doc_id FROM uni2
            WHERE doc_id NOT IN (
              SELECT node FROM comp WHERE node <> component
            )
            """
        ),
        "docs_keep_best_quality": (
            "WITH RECURSIVE pairs AS MATERIALIZED ("
            + docs_shingles.format(suffix=" zzz", threshold=0.8, extra_pred="")
            + """
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(node, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ), comp AS (
              SELECT node, min(label) AS component FROM reach GROUP BY node
            ), uni2 AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
              FROM documents WHERE doc_id % 50 = 0
            ), q AS (
              SELECT doc_id,
                     round((least(length(text) / 500.0, 1.0)
                            + (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                                ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                                     / length(text) END * 4.0, 1.0))
                            + least(CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0 THEN 0.0
                                ELSE len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                    w -> w IN ('the','and','of','to','in')))::DOUBLE
                                     / len(regexp_split_to_array(lower(trim(text)), '\\s+')) END * 5.0, 1.0)
                           ) / 3.0, 6) AS qscore
              FROM uni2
            ), reps AS (
              SELECT node FROM (
                SELECT c.node,
                       row_number() OVER (PARTITION BY c.component
                                          ORDER BY q.qscore DESC, c.node) AS rn
                FROM comp c JOIN q ON q.doc_id = c.node
              ) WHERE rn = 1
            )
            SELECT doc_id FROM uni2
            WHERE doc_id NOT IN (
              SELECT node FROM comp
              WHERE node NOT IN (SELECT node FROM reps)
            )
            """
        ),
        "curation_neardup_pipeline": """
            WITH RECURSIVE uni AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
              FROM documents WHERE doc_id % 50 = 0
            ), q AS (
              SELECT doc_id, text,
                     round((least(length(text) / 500.0, 1.0)
                            + (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                                ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                                     / length(text) END * 4.0, 1.0))
                            + least(CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0 THEN 0.0
                                ELSE len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                    w -> w IN ('the','and','of','to','in')))::DOUBLE
                                     / len(regexp_split_to_array(lower(trim(text)), '\\s+')) END * 5.0, 1.0)
                           ) / 3.0, 6) AS qscore
              FROM uni
            ), kept AS (
              SELECT doc_id, text, qscore FROM q WHERE qscore >= 0.5
            ), sh AS (
              SELECT doc_id,
                     list_distinct(
                       list_transform(generate_series(1, length(norm) - 4),
                                      i -> norm[i:i+4])) AS s
              FROM (SELECT doc_id,
                           lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
                    FROM kept)
            ), pairs AS MATERIALIZED (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b
                ON a.doc_id < b.doc_id
               AND least(len(a.s), len(b.s))::DOUBLE
                   >= 0.8 * greatest(len(a.s), len(b.s))
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(node, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ), comp AS (
              SELECT node, min(label) AS component FROM reach GROUP BY node
            ), reps AS (
              SELECT node FROM (
                SELECT c.node,
                       row_number() OVER (PARTITION BY c.component
                                          ORDER BY k.qscore DESC, c.node) AS rn
                FROM comp c JOIN kept k ON k.doc_id = c.node
              ) WHERE rn = 1
            ), surv AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words
              FROM kept
              WHERE doc_id NOT IN (
                SELECT node FROM comp
                WHERE node NOT IN (SELECT node FROM reps)
              )
            ), h AS (
              SELECT doc_id, text,
                len(list_filter(words, x -> x IN ('the','and','of','to','in'))) AS h_en,
                len(list_filter(words, x -> x IN ('der','die','und','nicht','das'))) AS h_de,
                len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS h_fr,
                len(list_filter(words, x -> x IN ('el','la','que','de','los'))) AS h_es
              FROM surv
            )
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                       AS bpe_tokens,
                   CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                        WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                        WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                        WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM h
        """,
        "docs_line_dedup": """
            WITH uni AS (
              SELECT doc_id,
                     concat_ws(chr(10), text,
                       CASE WHEN doc_id % 3 = 0
                            THEN 'AD: subscribe now' END,
                       'sig ' || doc_id) AS text
              FROM documents
            ), l AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     unnest(range(1, len(string_split(text, chr(10))) + 1))
                       AS pos
              FROM uni
            ), dup AS (
              SELECT trim(line) AS n FROM l
              WHERE trim(line) <> ''
              GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
            ), kept AS (
              SELECT doc_id, line, pos FROM l
              WHERE trim(line) NOT IN (SELECT n FROM dup)
            )
            SELECT u.doc_id,
                   coalesce(
                     (SELECT string_agg(k.line, chr(10) ORDER BY k.pos)
                      FROM kept k WHERE k.doc_id = u.doc_id), '') AS text
            FROM uni u
        """,
        "streaming_curation": r"""
            WITH p AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' contact u' || doc_id::VARCHAR ||
                               '@example.com or +1-555-0134 from 10.2.3.4 card 4111111111111111'
                          ELSE text END AS t
              FROM documents
            ), feat AS (
              SELECT doc_id, t,
                     length(t) AS n_chars,
                     CASE WHEN length(t) = 0 THEN 0.0
                          ELSE len(regexp_extract_all(t, '[^\w\s]'))::DOUBLE
                               / length(t) END AS pr,
                     regexp_split_to_array(lower(trim(t)), '\s+') AS words,
                     CASE WHEN trim(t) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(t), '\s+'))
                     END::BIGINT AS n_tok
              FROM p
            ), scored AS (
              SELECT doc_id, t, n_tok,
                     round((least(n_chars / 500.0, 1.0)
                            + (1.0 - least(pr * 4.0, 1.0))
                            + least(CASE WHEN len(words) = 0 THEN 0.0
                                         ELSE len(list_filter(words,
                                             w -> w IN ('the','and','of','to','in')))::DOUBLE
                                              / len(words) END * 5.0, 1.0)
                           ) / 3.0, 6) AS qscore
              FROM feat
            ), gated AS (
              SELECT * FROM scored WHERE qscore >= 0.45
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?', '<PHONE>', 'g'),
                     '\b\d{13,19}\b', '<CARD>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
                     AS clean_text,
                   n_tok, qscore
            FROM gated
        """,
        "select_token_budget_docs": """
            WITH w AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                               / length(text) END AS pr,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                          END AS n_tok
              FROM documents
            ), scored AS (
              SELECT doc_id,
                     round((least(n_chars / 500.0, 1.0)
                            + (1.0 - least(pr * 4.0, 1.0))
                            + least(CASE WHEN len(words) = 0 THEN 0.0
                                         ELSE len(list_filter(words,
                                             w -> w IN ('the','and','of','to','in')))::DOUBLE
                                              / len(words) END * 5.0, 1.0)
                           ) / 3.0, 6) AS qscore,
                     n_tok::BIGINT AS n_tok
              FROM w
            ), cum AS (
              SELECT doc_id, qscore, n_tok,
                     sum(n_tok) OVER (ORDER BY qscore DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running
              FROM scored
            )
            SELECT doc_id, qscore, n_tok FROM cum WHERE running <= 15000
        """,
        "exact_dedup_against_newbatch": r"""
            WITH newb AS (
              SELECT doc_id + 2000000 AS doc_id, text
              FROM documents WHERE doc_id % 25 = 0
              UNION ALL
              SELECT doc_id + 2500000, text || ' zzz'
              FROM documents WHERE doc_id % 25 = 0
              UNION ALL
              SELECT doc_id + 3000000,
                     translate(text, 'abcdefghijklmnopqrstuvwxyz',
                               'bcdefghijklmnopqrstuvwxyza')
              FROM documents WHERE doc_id % 25 = 7
              UNION ALL
              SELECT doc_id + 3500000,
                     translate(text, 'abcdefghijklmnopqrstuvwxyz',
                               'bcdefghijklmnopqrstuvwxyza')
              FROM documents WHERE doc_id % 25 = 7
            ), fps AS (
              SELECT doc_id,
                     md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
                       AS fp
              FROM newb
            ), within AS (
              SELECT min(doc_id) AS doc_id, fp FROM fps GROUP BY fp
            ), corpus AS (
              SELECT DISTINCT
                     md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
                       AS fp
              FROM documents
            )
            SELECT w.doc_id, w.fp
            FROM within w LEFT JOIN corpus c ON w.fp = c.fp
            WHERE c.fp IS NULL
        """,
        "incremental_dedup_newbatch": r"""
            WITH newb AS (
              SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
              FROM documents WHERE doc_id % 25 = 0
              UNION ALL
              SELECT doc_id + 3000000 AS doc_id,
                     translate(text, 'abcdefghijklmnopqrstuvwxyz',
                               'bcdefghijklmnopqrstuvwxyza') AS text
              FROM documents WHERE doc_id % 25 = 7
            ), shn AS (
              SELECT doc_id,
                     list_distinct(
                       list_transform(generate_series(1, length(norm) - 4),
                                      i -> norm[i:i+4])) AS s
              FROM (SELECT doc_id,
                           lower(regexp_replace(text, '\s+', ' ', 'g'))
                             AS norm
                    FROM newb)
            ), shc AS (
              SELECT doc_id,
                     list_distinct(
                       list_transform(generate_series(1, length(norm) - 4),
                                      i -> norm[i:i+4])) AS s
              FROM (SELECT doc_id,
                           lower(regexp_replace(text, '\s+', ' ', 'g'))
                             AS norm
                    FROM documents)
            )
            SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
                   round(len(list_intersect(n.s, c.s))::DOUBLE
                         / len(list_distinct(list_concat(n.s, c.s))), 6)
                     AS jaccard
            FROM shn n JOIN shc c
              ON least(len(n.s), len(c.s))::DOUBLE
                 >= 0.8 * greatest(len(n.s), len(c.s))
            WHERE len(list_intersect(n.s, c.s))::DOUBLE
                  / len(list_distinct(list_concat(n.s, c.s))) >= 0.8
        """,
        "dup_spans_docs": (
            "WITH " + span_cte + """
            SELECT doc_id, span_start, span_end,
                   span_end - span_start + 1 AS span_tokens
            FROM spans
            """
        ),
        "docs_span_dedup": (
            "WITH " + span_cte + """
            , tok AS (
              SELECT doc_id, unnest(ws) AS w,
                     unnest(range(1, len(ws) + 1)) - 1 AS pos
              FROM w
            ), kept AS (
              SELECT k.doc_id, k.w, k.pos FROM tok k
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = k.doc_id
                  AND k.pos BETWEEN s.span_start AND s.span_end)
            )
            SELECT d.doc_id,
                   coalesce((SELECT string_agg(k.w, ' ' ORDER BY k.pos)
                             FROM kept k WHERE k.doc_id = d.doc_id),
                            '') AS text
            FROM w d
            """
        ),
        "simhash_near_dups": docs_shingles.format(
            suffix="  ",
            threshold=0.9,
            extra_pred="AND b.doc_id - a.doc_id = 1000000",
        ),
        # knn_lsh and knn_ivf share the fixture AND the oracle: both index
        # lifecycles must recover the same brute-force top-10
        "knn_lsh": _KNN_PLANTED_ORACLE,
        "knn_ivf": _KNN_PLANTED_ORACLE,
        "knn_ivf_batch": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id IN (0, 1, 2)
            ), uni AS (
              SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
              UNION ALL
              SELECT 1000000 * (j + 1) + i AS vec_id,
                     list_transform(
                       (SELECT embedding FROM embeddings WHERE vec_id = j),
                       x -> CAST(x * (1.0 + i / 10000.0) AS FLOAT))::DOUBLE[]
              FROM generate_series(1, 9) t(i), generate_series(0, 2) s(j)
            ), ranked AS (
              SELECT q.query_id, u.vec_id,
                     round(list_cosine_similarity(u.emb, q.qv), 6) AS cosine,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(u.emb, q.qv), 6)
                                DESC, u.vec_id ASC) AS rn
              FROM uni u, q
            )
            SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= 10
        """,
        "training_pipeline_docs": """
            WITH uni AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 50 = 0
            ), scored AS (
              SELECT doc_id, text,
                     round((least(length(text) / 500.0, 1.0)
                            + (1.0 - least(
                                CASE WHEN length(text) = 0 THEN 0.0
                                     ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                                          / length(text) END * 4.0, 1.0))
                            + least(
                                CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0
                                     THEN 0.0
                                     ELSE len(list_filter(
                                            regexp_split_to_array(lower(trim(text)), '\\s+'),
                                            w -> w IN ('the','and','of','to','in')))::DOUBLE
                                          / len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                                END * 5.0, 1.0)
                           ) / 3.0, 6) AS qs
              FROM uni
            ), kept AS (
              SELECT doc_id, text FROM scored WHERE qs >= 0.5
            ), ded AS (
              SELECT doc_id, text, row_number() OVER (
                PARTITION BY md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
                ORDER BY doc_id) AS rn
              FROM kept
            )
            , surv AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words
              FROM ded WHERE rn = 1
            ), h AS (
              SELECT doc_id, text,
                len(list_filter(words, x -> x IN ('the','and','of','to','in'))) AS h_en,
                len(list_filter(words, x -> x IN ('der','die','und','nicht','das'))) AS h_de,
                len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS h_fr,
                len(list_filter(words, x -> x IN ('el','la','que','de','los'))) AS h_es
              FROM surv
            )
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                       AS bpe_tokens,
                   CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                        WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                        WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                        WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM h
        """,
        # the chunked (skew-resistant) sessionizer must be output-identical
        # to the plain one, so both run against the SAME oracle
        "hash_split_docs": """
            SELECT doc_id,
                   CASE WHEN b < 800000 THEN 'train'
                        WHEN b < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substring(
                        md5('split42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
                        AS BIGINT) % 1000000 AS b
              FROM documents
            )
        """,
        # the four curation operators (operators/curation.py): PII chain,
        # 5-gram decontamination vs the test split, per-source mixing
        # sample, greedy token packing (recursive CTE replays the same
        # data-dependent recurrence the applyInPandas kernel runs)
        "pii_redaction": r"""
            WITH p AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' contact u' || doc_id::VARCHAR ||
                               '@example.com or +1-555-0134 from 10.2.3.4 card 4111111111111111'
                          ELSE text END AS t
              FROM documents
            ), s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t
              FROM p
            ), s2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t,
                       '\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?')) AS n_phone,
                     regexp_replace(t,
                       '\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?',
                       '<PHONE>', 'g') AS t
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_email, n_phone,
                     len(regexp_extract_all(t, '\b\d{13,19}\b')) AS n_card,
                     regexp_replace(t, '\b\d{13,19}\b', '<CARD>', 'g') AS t
              FROM s2
            ), s4 AS (
              SELECT doc_id, n_email, n_phone, n_card,
                     len(regexp_extract_all(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                     regexp_replace(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS t
              FROM s3
            )
            SELECT doc_id, t AS clean_text, n_email, n_phone, n_card, n_ipv4
            FROM s4
        """,
        "decontaminate_docs": r"""
            WITH lab AS (
              SELECT doc_id, text,
                     CAST(('0x' || substring(
                        md5('split42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
                        AS BIGINT) % 1000000 AS b
              FROM documents
            ), corpus AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS ws
              FROM lab WHERE b < 800000
            ), bench AS (
              SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ws
              FROM lab WHERE b >= 900000
            ), bi AS (
              SELECT ws, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS i
              FROM bench
            ), bg AS (
              SELECT DISTINCT array_to_string(ws[i:i+4], ' ') AS gram FROM bi
            ), ci AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS i
              FROM corpus
            ), hits AS (
              SELECT DISTINCT doc_id FROM ci
              WHERE array_to_string(ws[i:i+4], ' ') IN (SELECT gram FROM bg)
            )
            SELECT c.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM corpus c LEFT JOIN hits h USING (doc_id)
        """,
        "mix_sample_docs": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            WHERE CAST(('0x' || substring(
                     md5('mix42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
                     AS BIGINT) % 1000000
                  < CASE source WHEN 'src0' THEN 1000000
                                WHEN 'src1' THEN 250000
                                WHEN 'src2' THEN 500000
                                WHEN 'src3' THEN 750000
                                ELSE 100000 END
        """,
        "pack_docs": r"""
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END::BIGINT AS n_tok,
                     CAST(('0x' || substring(
                        md5('pack42:' || doc_id::VARCHAR), 1, 8))::UBIGINT
                        AS BIGINT) % 1000000 % 8 AS bucket
              FROM documents
            ), d AS (
              SELECT bucket, doc_id, n_tok,
                     row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                       AS rn
              FROM t
            ), p AS (
              SELECT bucket, doc_id, n_tok, rn,
                     0::BIGINT AS seq_id, n_tok AS fill
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.bucket, d.doc_id, d.n_tok, d.rn,
                     CASE WHEN p.fill > 0 AND p.fill + d.n_tok > 256
                          THEN p.seq_id + 1 ELSE p.seq_id END,
                     CASE WHEN p.fill > 0 AND p.fill + d.n_tok > 256
                          THEN d.n_tok ELSE p.fill + d.n_tok END
              FROM p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1
            )
            SELECT bucket, doc_id, n_tok, seq_id FROM p
        """,
        "cdc_enrich_asof": f"""
            WITH log AS (
              SELECT * FROM read_parquet('{_ASOF_ORACLE_LOG}/epoch=*/*.parquet',
                                         hive_partitioning=1)
            ), valid AS (
              SELECT log_offset, CAST(epoch AS BIGINT) AS epoch, op,
                     json_extract_string(payload, '$.doc_id') AS doc_id,
                     CAST(json_extract_string(payload, '$.n_tok') AS INT)
                       AS n_tok,
                     json_extract_string(payload, '$.source') AS source,
                     json_extract_string(payload, '$.lang') AS lang
              FROM log
              WHERE json_valid(payload)
                AND (json_type(payload, '$.tokens') IS DISTINCT FROM 'VARCHAR'
                     OR json_valid(json_extract_string(payload, '$.tokens')))
            ), vk AS (
              SELECT * FROM valid WHERE doc_id IS NOT NULL
            ), probe_ids AS (
              SELECT doc_id FROM (
                SELECT DISTINCT doc_id FROM vk ORDER BY doc_id LIMIT 50
              ) UNION ALL SELECT 'doc-miss'
            ), probes AS (
              SELECT e.epoch AS probe_epoch, p.doc_id
              FROM (SELECT DISTINCT CAST(epoch AS BIGINT) AS epoch FROM log) e
              CROSS JOIN probe_ids p
            ), joined AS (
              SELECT p.probe_epoch, p.doc_id, v.op, v.n_tok, v.source, v.lang,
                     row_number() OVER (
                       PARTITION BY p.probe_epoch, p.doc_id
                       ORDER BY v.log_offset DESC
                     ) AS rn
              FROM probes p LEFT JOIN vk v
                ON v.doc_id = p.doc_id AND v.epoch <= p.probe_epoch
            )
            SELECT probe_epoch, doc_id,
                   CASE WHEN op = 'D' THEN NULL ELSE n_tok END AS n_tok,
                   CASE WHEN op = 'D' THEN NULL ELSE source END AS source,
                   CASE WHEN op = 'D' THEN NULL ELSE lang END AS lang
            FROM joined WHERE rn = 1
        """,
        "top_ngrams_by_lang": r"""
            WITH w AS (
              SELECT lang,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS ws
              FROM documents
            ), i AS (
              SELECT lang, ws,
                     unnest(range(1, greatest(len(ws) - 2, 1) + 1)) AS i
              FROM w
            ), g AS (
              SELECT lang, array_to_string(ws[i:i+2], ' ') AS gram FROM i
            ), c AS (
              SELECT lang, gram, count(*) AS cnt
              FROM g GROUP BY 1, 2 HAVING count(*) >= 2
            ), r AS (
              SELECT lang, gram, cnt,
                     row_number() OVER (
                       PARTITION BY lang ORDER BY cnt DESC, gram
                     ) AS rank
              FROM c
            )
            SELECT lang, gram, cnt, rank FROM r WHERE rank <= 10
        """,
        "cdc_quarantine": f"""
            WITH log AS (
              SELECT * FROM read_parquet('{_DLQ_ORACLE_LOG}/epoch=*/*.parquet',
                                         hive_partitioning=1)
            )
            SELECT log_offset, op,
                   CASE WHEN payload IS NULL THEN 'null_merge_key'
                        WHEN NOT json_valid(payload) THEN 'malformed_document'
                        WHEN json_type(payload, '$.tokens') = 'VARCHAR'
                             THEN 'cast_error'
                        WHEN json_extract_string(payload, '$.doc_id') IS NULL
                             THEN 'null_merge_key'
                   END AS _invalid_reason
            FROM log
            WHERE payload IS NULL
               OR NOT json_valid(payload)
               OR json_type(payload, '$.tokens') = 'VARCHAR'
               OR json_extract_string(payload, '$.doc_id') IS NULL
        """,
        "expand_quarantine": """
            SELECT event_id,
                   CASE WHEN event_id % 31 = 0 THEN 'malformed_document'
                        ELSE 'cast_error' END AS _invalid_reason
            FROM events
            WHERE event_id % 31 = 0 OR event_id % 17 = 0
        """,
        "asof_prior_click": """
            SELECT l.event_id,
                   l.user_id,
                   l.ts,
                   l.value AS purchase_value,
                   r.ts    AS click_ts,
                   r.value AS click_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'click') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "token_quantiles_by_lang": """
            WITH w AS (
              SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS words,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END::DOUBLE AS n
              FROM documents
            ), h AS (
              SELECT n,
                len(list_filter(words, x -> x IN ('the','and','of','to','in'))) AS h_en,
                len(list_filter(words, x -> x IN ('der','die','und','nicht','das'))) AS h_de,
                len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS h_fr,
                len(list_filter(words, x -> x IN ('el','la','que','de','los'))) AS h_es
              FROM w
            ), l AS (
              SELECT n,
                     CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                          WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                          WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                          WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                          ELSE 'de' END AS lang_pred
              FROM h
            )
            SELECT lang_pred,
                   round(quantile_cont(n, 0.25), 6) AS q25,
                   round(quantile_cont(n, 0.50), 6) AS q50,
                   round(quantile_cont(n, 0.90), 6) AS q90,
                   count(*) AS cnt
            FROM l GROUP BY lang_pred
        """,
        "sessionize_events": _SESSIONIZE_ORACLE,
        "sessionize_chunked": _SESSIONIZE_ORACLE,
        "streaming_windowed_agg": """
            SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "streaming_sessionize": _SESSIONIZE_CTE + """
            SELECT user_id, min(t_us) AS start_us, max(t_us) AS last_us,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, session_seq
        """,
        "stateful_transitions": """
            SELECT prev_type, event_type, count(*) AS n FROM (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
                     event_type
              FROM events
            ) WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "embedding_near_dups": """
            WITH uni AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id,
                     list_transform(embedding,
                                    x -> CAST(x * 1.0001 AS FLOAT)) AS embedding
              FROM embeddings WHERE vec_id % 50 = 0
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM uni a JOIN uni b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= 0.99
        """,
        "semdedup_embeddings": """
            WITH RECURSIVE uni AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id,
                     list_transform(embedding,
                                    x -> CAST(x * 1.0001 AS FLOAT)) AS embedding
              FROM embeddings WHERE vec_id % 50 = 0
            ), pairs AS MATERIALIZED (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM uni a JOIN uni b ON a.vec_id < b.vec_id
              WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]), 6)
                    >= 0.99
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(node, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ), comp AS (
              SELECT node, min(label) AS component FROM reach GROUP BY node
            )
            SELECT u.vec_id FROM uni u
            WHERE u.vec_id NOT IN (
              SELECT node FROM comp WHERE node <> component)
        """,
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
        "repetition_scores": """
            WITH uni AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' ' || text AS text
              FROM documents WHERE doc_id % 40 = 0
            ), w AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS words
              FROM uni
            ), g AS (
              SELECT doc_id, words, len(words) AS n,
                     list_transform(
                       generate_series(1, len(words) - 1),
                       i -> words[i] || ' ' || words[i + 1]) AS g2,
                     list_transform(
                       generate_series(1, len(words) - 2),
                       i -> words[i] || ' ' || words[i + 1] || ' '
                            || words[i + 2]) AS g3
              FROM w
            )
            SELECT doc_id, n AS n_words,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE round(len(list_distinct(words))::DOUBLE / n, 6)
                   END AS type_token_ratio,
                   CASE WHEN n < 2 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(g2))::DOUBLE
                                   / len(g2), 6)
                   END AS dup_2gram_frac,
                   CASE WHEN n < 3 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(g3))::DOUBLE
                                   / len(g3), 6)
                   END AS dup_3gram_frac
            FROM g
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
            WITH uni AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
            )
            SELECT md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))) AS fp,
                   count(*) AS n_dups,
                   min(doc_id) AS min_id,
                   max(doc_id) AS max_id
            FROM uni
            GROUP BY 1 HAVING count(*) > 1
        """,
        # (near-dup/ANN queries now have hard oracles above: the planted
        # fixtures make the fixed-seed LSH/SimHash candidate generation
        # deterministic AND all-pairs-verifiable in SQL)
        "knn_bruteforce": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # every query above is hash-verified; the stateful replays, the
        # change feed, the aggregate view, and the derived replica are
        # verified by SQL-replaying their own materialized change logs
        # (the per-UID fixed _ORACLE_TMP paths written by the Spark queries)
    }
