"""Regressions for cross-path parity bugs found in review: the Catalyst and
Arrow strategies must agree with each other (and with Java semantics) on
session timezones, long overflow saturation, NaN doubles, underscore
rejection, and recursive-wildcard root exclusion."""

import datetime
import math

import pytest

from embulk_filter_expand_json_spark import expand_json
from embulk_filter_expand_json_spark.functions.jsonpath import compile_path


def expand_one(spark, doc, col, mode, **cfg_extra):
    df = spark.createDataFrame([(doc,)], "_c0 string")
    cfg = {"json_column_name": "_c0", "expanded_columns": [col], **cfg_extra}
    rows = expand_json(df, cfg, mode=mode).collect()
    return rows[0][col["name"]] if rows else None


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_timestamp_independent_of_session_timezone(spark, mode):
    """Naive timestamps must be interpreted in the COLUMN timezone no matter
    what spark.sql.session.timeZone is (was: double-shifted on Catalyst)."""
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = expand_one(
            spark,
            '{"t": "2020-01-01 00:00:00"}',
            {
                "name": "t",
                "type": "timestamp",
                "format": "%Y-%m-%d %H:%M:%S",
                "timezone": "America/New_York",
            },
            mode,
        )
        # correct instant: 2020-01-01T05:00:00Z (collect() renders naive
        # datetimes in the OS-local timezone, UTC on this box; the buggy
        # session-dependent path produced 2019-12-31T20:00Z instead)
        assert got == datetime.datetime(2020, 1, 1, 5, 0, 0), got
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_long_overflow_saturates_like_java(spark, mode):
    """(long) Double.parseDouble('1e20') saturates at Long.MAX_VALUE; the
    row must NOT be dropped (was: Catalyst nulled on overflow)."""
    assert (
        expand_one(spark, '{"k": "1e20"}', {"name": "k", "type": "long"}, mode)
        == 9223372036854775807
    )
    assert (
        expand_one(spark, '{"k": "-1e20"}', {"name": "k", "type": "long"}, mode)
        == -9223372036854775808
    )


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_double_nan_is_a_value_not_null(spark, mode):
    """Double.parseDouble('NaN') is valid — must survive as NaN (was:
    Arrow path coerced NaN to null at the pandas->Arrow boundary)."""
    got = expand_one(spark, '{"k": "NaN"}', {"name": "k", "type": "double"}, mode)
    assert got is not None and math.isnan(got)


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
@pytest.mark.parametrize("type_", ["long", "double"])
def test_underscore_separators_rejected(spark, mode, type_):
    """Java's parsers reject '1_0'; Python's int()/float() accept it (was:
    Arrow path returned 10). Row must be dropped as an invalid record."""
    df = spark.createDataFrame([('{"k": "1_0"}',), ('{"k": "7"}',)], "_c0 string")
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "k", "type": type_}],
    }
    rows = expand_json(df, cfg, mode=mode).collect()
    assert len(rows) == 1 and float(rows[0]["k"]) == 7.0


def test_recursive_wildcard_excludes_root():
    """Jayway's '$..*' yields descendants only (was: root included)."""
    assert compile_path("$..*").read({"a": 1}) == [1]
    assert compile_path("$..*").read({"a": {"b": 2}}) == [{"b": 2}, 2]
    assert compile_path("$.x..*").read({"x": [1, [2]]}) == [1, [2], 2]
