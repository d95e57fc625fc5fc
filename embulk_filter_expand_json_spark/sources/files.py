"""File sources — the input side the reference delegates to Embulk plugins.

The reference's example pipeline (/root/reference/example/config.yml:1-17)
reads TSV through Embulk's CSV parser with declared columns
(`{name, type, format?}`), then applies the expansion filter. This module
reproduces that input contract on `spark.read.csv`:

- the Embulk column list maps to an all-strings read schema followed by the
  SAME cast layer the expansion operator uses (try_cast chains,
  Ruby-strftime timestamp translation, per-column timezone) so CSV-side and
  JSON-side type semantics are identical;
- `parser: type: none` (the reference's bench raw-line mode,
  bench/config_raw.yml:4-6) maps to `spark.read.text`.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from embulk_filter_expand_json_spark.functions.timefmt import (
    translate_ruby_to_java,
)
from embulk_filter_expand_json_spark.operators.expand import catalyst_cast
from embulk_filter_expand_json_spark.plans.expand_plan import ConfigException


def _cast_column(
    raw: Column,
    type_: str,
    fmt: Optional[str],
    timezone: str,
    default_date: str,
    session_tz: str,
) -> Column:
    """One shared cast layer with the expansion operator (catalyst_cast) —
    CSV-side and JSON-side type semantics are the same code path."""
    if type_ not in ("string", "boolean", "long", "double", "timestamp", "json"):
        raise ConfigException(f"unknown column type {type_!r}")
    ruby_fmt = fmt or "%Y-%m-%d %H:%M:%S.%N %z"
    if type_ == "timestamp" and translate_ruby_to_java(ruby_fmt) is None:
        raise ConfigException(
            f"timestamp format {ruby_fmt!r} is not Catalyst-translatable"
        )
    val, _err = catalyst_cast(
        raw,
        type_,
        timestamp_format=ruby_fmt if type_ == "timestamp" else None,
        timezone=timezone,
        date=default_date,
        session_tz=session_tz,
    )
    return val


def read_csv(
    spark: SparkSession,
    path: str,
    columns: Sequence[Mapping],
    delimiter: str = ",",
    header: bool = False,
    skip_header_lines: int = 0,
    default_timezone: str = "UTC",
    default_date: str = "1970-01-01",
    null_string: Optional[str] = None,
) -> DataFrame:
    """Embulk-CSV-parser-style read: ``columns`` is a list of
    ``{name, type, format?, timezone?}`` dicts (the reference's
    `parser.columns`, example/config.yml:8-16)."""
    names = [c["name"] for c in columns]
    if len(set(names)) != len(names):
        raise ConfigException("duplicate column names in csv columns")
    reader = (
        spark.read.option("delimiter", delimiter)
        .option("header", header)
        .option("mode", "PERMISSIVE")
    )
    if null_string is not None:
        reader = reader.option("nullValue", null_string)
    raw = reader.csv(path).toDF(*names)
    if skip_header_lines and not header:
        # Embulk skips N physical lines PER FILE. Single file: partition 0 is
        # the first byte-range split, so a monotonic-id filter is exact and
        # shuffle-free. Multiple files: rank rows within each file —
        # monotonically_increasing_id orders rows within a file because
        # Spark enumerates a file's splits in offset order (one window
        # shuffle keyed by file name; header-skip is a per-file scan in
        # Embulk too).
        if len(raw.inputFiles()) <= 1:
            raw = (
                raw.withColumn("__rid", F.monotonically_increasing_id())
                .filter(F.col("__rid") >= skip_header_lines)
                .drop("__rid")
            )
        else:
            from pyspark.sql import Window

            w = Window.partitionBy(F.input_file_name()).orderBy(
                F.monotonically_increasing_id()
            )
            raw = (
                raw.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") > skip_header_lines)
                .drop("__rn")
            )
    session_tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    out = [
        _cast_column(
            F.col(c["name"]),
            c.get("type", "string"),
            c.get("format"),
            c.get("timezone", default_timezone),
            default_date,
            session_tz,
        ).alias(c["name"])
        for c in columns
    ]
    return raw.select(out)


def read_raw_lines(
    spark: SparkSession, path: str, column_name: str = "payload"
) -> DataFrame:
    """The reference bench's `parser: type: none` (one string column per
    line, bench/config_raw.yml:4-6)."""
    return spark.read.text(path).withColumnRenamed("value", column_name)


def read_jsonl(
    spark: SparkSession,
    path: str,
    columns: Sequence[Mapping],
    default_timezone: str = "UTC",
    default_date: str = "1970-01-01",
    stop_on_invalid_record: bool = False,
    keep_document_column: Optional[str] = None,
) -> DataFrame:
    """Embulk-jsonl-parser-style read: newline-delimited JSON objects with a
    declared ``columns`` list (``{name, type, format?, timezone?}``) — the
    natural wire format of a binlog/WAL tail.

    Built BY COMPOSITION: the source is `spark.read.text` plus the engine's
    own expansion operator over root='$', so the JSONL column extraction and
    casting are literally the same code (and the same physical plan: one
    json_tuple parse under whole-stage codegen) as the expansion filter —
    no second cast layer to drift. Invalid lines follow the operator's
    invalid-record channel: dropped, or abort-on-first when
    ``stop_on_invalid_record``. ``keep_document_column`` retains the raw
    line under that name (keep_expanding_json_column parity)."""
    from embulk_filter_expand_json_spark.operators.expand import expand_json
    from embulk_filter_expand_json_spark.plans.expand_plan import (
        ExpandConfig,
        ExpandedColumn,
    )

    names = [c["name"] for c in columns]
    if len(set(names)) != len(names):
        raise ConfigException("duplicate column names in jsonl columns")
    doc_col = keep_document_column or "__jsonl_doc"
    raw = read_raw_lines(spark, path, doc_col)
    cfg = ExpandConfig(
        json_column_name=doc_col,
        expanded_columns=tuple(
            ExpandedColumn(
                name=c["name"],
                type=c.get("type", "string"),
                format=c.get("format"),
                timezone=c.get("timezone"),
            )
            for c in columns
        ),
        default_timezone=default_timezone,
        default_date=default_date,
        stop_on_invalid_record=stop_on_invalid_record,
        keep_expanding_json_column=keep_document_column is not None,
        # a malformed line is an invalid record of the SOURCE, not a broken
        # document inside an otherwise-valid record — route it to the
        # invalid-record channel (drop / abort-on-first), never hard-abort
        malformed_json_policy="invalid_record",
    )
    return expand_json(raw, cfg, mode="auto")
