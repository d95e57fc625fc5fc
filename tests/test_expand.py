"""End-to-end operator tests over Spark — the reference's behavioral suite
(TestExpandJsonFilterPlugin.java) run against BOTH physical strategies
(Catalyst fast path and Arrow general path) wherever the plan allows."""

import datetime
import json

import pytest

from pyspark.sql import Row, types as T

from embulk_filter_expand_json_spark import expand_json
from embulk_filter_expand_json_spark.plans.expand_plan import DataException

UTC = datetime.timezone.utc

FLAGSHIP_DOC = {
    "_j0": True,
    "_j1": 2,
    "_j2": "2014-10-21 04:44:33 +0900",
    "_j3": 4.4,
    "_j4": "v5",
    "_j5": "2014-10-21 04:44:33 +0000",
    "_j6": "2014-10-21 04:44:33",
    "_j7": {
        "store": {
            "book": [
                {"author": "Nigel Rees", "title": "Sayings of the Century", "price": 8.95},
                {"author": "Evelyn Waugh", "title": "Sword of Honour", "price": 12.99},
                {"author": "Herman Melville", "title": "Moby Dick", "isbn": "0-553-21311-3", "price": 8.99},
                {"author": "J. R. R. Tolkien", "title": "The Lord of the Rings", "isbn": "0-395-19395-8", "price": 22.99},
            ],
            "bicycle": {"color": "red", "price": 19.95},
        },
        "expensive": 10,
    },
    "_c0": "v12",
}


def make_df(spark, docs, extra="_c1_data"):
    return spark.createDataFrame(
        [(d, extra) for d in docs], "_c0 string, _c1 string"
    )


def test_jsonpath_full_suite(spark):
    """testExpandJsonValuesFromString (:855-1036) — golden values verbatim."""
    df = make_df(spark, [json.dumps(FLAGSHIP_DOC)])
    cfg = {
        "json_column_name": "_c0",
        "root": "$.",
        "default_timezone": "Asia/Tokyo",
        "expanded_columns": [
            {"name": "_j0", "type": "boolean"},
            {"name": "_j1", "type": "long"},
            {"name": "_j2", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S %z"},
            {"name": "_j3", "type": "double"},
            {"name": "_j4", "type": "string"},
            {"name": "_j5", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S %z"},
            {"name": "_j6", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
            {"name": "_j7.store.book[*].author", "type": "string"},
            {"name": "_j7..book[?(@.price <= $['_j7']['expensive'])].author", "type": "string"},
            {"name": "_j7..book[?(@.isbn)]", "type": "string"},
            {"name": "_j7..book[?(@.author =~ /.*REES/i)].title", "type": "string"},
            {"name": "_j7.store.book[2].author", "type": "string"},
            {"name": "_c0", "type": "string"},
        ],
    }
    row = expand_json(df, cfg, mode="arrow").collect()[0]
    assert row["_j0"] is True
    assert row["_j1"] == 2
    assert row["_j2"] == datetime.datetime(2014, 10, 20, 19, 44, 33)
    assert row["_j3"] == 4.4
    assert row["_j4"] == "v5"
    assert row["_j5"] == datetime.datetime(2014, 10, 21, 4, 44, 33)
    assert row["_j6"] == datetime.datetime(2014, 10, 20, 19, 44, 33)
    assert row["_j7.store.book[*].author"] == (
        '["Nigel Rees","Evelyn Waugh","Herman Melville","J. R. R. Tolkien"]'
    )
    assert row["_j7..book[?(@.price <= $['_j7']['expensive'])].author"] == (
        '["Nigel Rees","Herman Melville"]'
    )
    assert row["_j7..book[?(@.isbn)]"] == (
        '[{"author":"Herman Melville","title":"Moby Dick","isbn":"0-553-21311-3","price":8.99},'
        '{"author":"J. R. R. Tolkien","title":"The Lord of the Rings","isbn":"0-395-19395-8","price":22.99}]'
    )
    assert row["_j7..book[?(@.author =~ /.*REES/i)].title"] == '["Sayings of the Century"]'
    assert row["_j7.store.book[2].author"] == "Herman Melville"
    assert row["_c0"] == "v12"
    assert row["_c1"] == "_c1_data"


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_definite_paths_both_modes(spark, mode):
    df = make_df(spark, [json.dumps(FLAGSHIP_DOC)])
    cfg = {
        "json_column_name": "_c0",
        "default_timezone": "Asia/Tokyo",
        "expanded_columns": [
            {"name": "_j0", "type": "boolean"},
            {"name": "_j1", "type": "long"},
            {"name": "_j2", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S %z"},
            {"name": "_j3", "type": "double"},
            {"name": "_j6", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
            {"name": "_j7.store.book[2].author", "type": "string"},
            {"name": "_j7.store.bicycle", "type": "json"},
        ],
    }
    row = expand_json(df, cfg, mode=mode).collect()[0]
    assert row["_j0"] is True
    assert row["_j1"] == 2
    assert row["_j2"] == datetime.datetime(2014, 10, 20, 19, 44, 33)
    assert row["_j3"] == 4.4
    assert row["_j6"] == datetime.datetime(2014, 10, 20, 19, 44, 33)
    assert row["_j7.store.book[2].author"] == "Herman Melville"
    assert row["_j7.store.bicycle"] == '{"color":"red","price":19.95}'


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_exponential_notation(spark, mode):
    """testParseNumbersInExponentialNotation (:1084-1130)."""
    df = make_df(spark, ['{"_j0": -1.234e-5, "_j1": 12345e3}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [
            {"name": "_j0", "type": "double"},
            {"name": "_j1", "type": "long"},
        ],
    }
    row = expand_json(df, cfg, mode=mode).collect()[0]
    assert row["_j0"] == pytest.approx(-0.00001234)
    assert row["_j1"] == 12_345_000


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_null_and_missing_semantics(spark, mode):
    """testExpandSpecialJsonValuesFromString (:796-832): empty-string doc and
    missing key -> NULL expanded columns; pass-through unaffected."""
    df = make_df(spark, ["", None, '{"other": 1}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_e0", "type": "string"}],
    }
    rows = expand_json(df, cfg, mode=mode).collect()
    assert len(rows) == 3
    assert all(r["_e0"] is None for r in rows)
    assert all(r["_c1"] == "_c1_data" for r in rows)


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_stop_on_invalid_record_skip(spark, mode):
    """testStopOnInvalidRecordOption (:424-488): false -> bad row DROPPED."""
    df = make_df(spark, ['{"_e0": ""}', '{"_e0": {}}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_e0", "type": "json"}],
        "stop_on_invalid_record": False,
    }
    rows = expand_json(df, cfg, mode=mode).collect()
    assert len(rows) == 1
    assert rows[0]["_e0"] == "{}"


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_stop_on_invalid_record_abort(spark, mode):
    df = make_df(spark, ['{"_e0": ""}', '{"_e0": {}}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_e0", "type": "json"}],
        "stop_on_invalid_record": True,
    }
    with pytest.raises(Exception) as ei:
        expand_json(df, cfg, mode=mode).collect()
    assert "invalid record" in str(ei.value).lower()


@pytest.mark.parametrize("type_", ["double", "long", "timestamp", "json"])
@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_invalid_cast_aborts(spark, mode, type_):
    """testSetExpandedJsonColumnsSetInvalid*Value (:682-704)."""
    df = make_df(spark, ['{"_e0": "abcde"}'])
    col = {"name": "_e0", "type": type_}
    if type_ == "timestamp":
        col["format"] = "%Y-%m-%d %H:%M:%S"
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [col],
        "stop_on_invalid_record": True,
    }
    with pytest.raises(Exception):
        expand_json(df, cfg, mode=mode).collect()


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_malformed_json_aborts(spark, mode):
    """testAbortBrokenJsonString (:1039-1081): broken top-level JSON aborts
    even with stop_on_invalid_record=false."""
    df = make_df(spark, ['{"_j0": "te'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_j0", "type": "string"}],
        "stop_on_invalid_record": False,
    }
    with pytest.raises(Exception) as ei:
        expand_json(df, cfg, mode=mode).collect()
    assert "json" in str(ei.value).lower()


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_malformed_json_invalid_record_policy(spark, mode):
    df = make_df(spark, ['{"_j0": "te', '{"_j0": "ok"}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_j0", "type": "string"}],
        "malformed_json_policy": "invalid_record",
    }
    rows = expand_json(df, cfg, mode=mode).collect()
    assert len(rows) == 1
    assert rows[0]["_j0"] == "ok"


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_keep_expanding_json_column(spark, mode):
    """testExpandedJsonValuesWithKeepJsonColumns (:742-793)."""
    df = make_df(spark, ['{"_e0": "v"}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "_e0", "type": "string"}],
        "keep_expanding_json_column": True,
    }
    out = expand_json(df, cfg, mode=mode)
    assert out.columns == ["_c0", "_e0", "_c1"]
    row = out.collect()[0]
    assert row["_c0"] == '{"_e0": "v"}'
    assert row["_e0"] == "v"


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_passthrough_all_types(spark, mode):
    """testUnchangedColumnValues (:375-421): every type passes through."""
    schema = T.StructType(
        [
            T.StructField("_c0", T.StringType()),
            T.StructField("_c1", T.BooleanType()),
            T.StructField("_c2", T.DoubleType()),
            T.StructField("_c3", T.LongType()),
            T.StructField("_c4", T.TimestampType()),
            T.StructField("_c5", T.StringType()),
            T.StructField("_c6", T.StringType()),
        ]
    )
    ts = datetime.datetime(1970, 1, 1, 0, 0, 4)
    df = spark.createDataFrame(
        [("_v0", True, 0.2, 3, ts, '{"_e0":"_v5"}', '{"_e0":"_v6"}')], schema
    )
    cfg = {
        "json_column_name": "_c6",
        "expanded_columns": [{"name": "_e0", "type": "string"}],
    }
    row = expand_json(df, cfg, mode=mode).collect()[0]
    assert row["_c0"] == "_v0"
    assert row["_c1"] is True
    assert row["_c2"] == 0.2
    assert row["_c3"] == 3
    assert row["_c4"] == ts
    assert row["_c5"] == '{"_e0":"_v5"}'
    assert row["_e0"] == "_v6"


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_timestamp_per_column_timezone(spark, mode):
    """testColumnBasedTimezone (:545-587)."""
    df = make_df(
        spark, ['{"_j0": "2014-10-21 04:44:33", "_j1": "2014-10-21 04:44:33"}']
    )
    cfg = {
        "json_column_name": "_c0",
        "default_timezone": "UTC",
        "expanded_columns": [
            {"name": "_j0", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
            {
                "name": "_j1",
                "type": "timestamp",
                "format": "%Y-%m-%d %H:%M:%S",
                "timezone": "Asia/Tokyo",
            },
        ],
    }
    row = expand_json(df, cfg, mode=mode).collect()[0]
    assert row["_j0"] == datetime.datetime(2014, 10, 21, 4, 44, 33)
    assert row["_j1"] == datetime.datetime(2014, 10, 20, 19, 44, 33)


def test_auto_mode_picks_catalyst_for_definite_plans(spark):
    from embulk_filter_expand_json_spark.operators.expand import (
        _catalyst_eligible,
    )
    from embulk_filter_expand_json_spark.functions.jsonpath import compile_path
    from embulk_filter_expand_json_spark.plans.expand_plan import (
        ExpandConfig,
        plan_expansion,
    )

    schema = T.StructType([T.StructField("_c0", T.StringType())])
    c = ExpandConfig.from_dict(
        {
            "json_column_name": "_c0",
            "expanded_columns": [{"name": "a.b[0]", "type": "long"}],
        }
    )
    plan = plan_expansion(c, schema)
    compiled = [compile_path(s.json_path) for s in plan.specs]
    assert _catalyst_eligible(plan, compiled)

    c2 = ExpandConfig.from_dict(
        {
            "json_column_name": "_c0",
            "expanded_columns": [{"name": "a[*]", "type": "string"}],
        }
    )
    plan2 = plan_expansion(c2, schema)
    compiled2 = [compile_path(s.json_path) for s in plan2.specs]
    assert not _catalyst_eligible(plan2, compiled2)

    # auto on a definite plan must stay pure-Catalyst: no Python workers
    df = make_df(spark, ['{"a": 1}'])
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "a", "type": "long"}],
    }
    plan_str = expand_json(df, cfg, mode="auto")._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan_str.lower()


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_metrics_invalid_count_and_drop(spark, mode):
    docs = ['{"n": "bad"}', '{"n": 1}', '{"n": 2}', '{"n": "worse"}']
    df = make_df(spark, docs)
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": "n", "type": "long"}],
    }
    acc = spark.sparkContext.accumulator(0)
    out = expand_json(df, cfg, mode=mode, metrics={"invalid_records": acc})
    rows = out.collect()
    assert sorted(r["n"] for r in rows) == [1, 2]
    if mode == "arrow":
        assert acc.value == 2


def test_expand_struct_source_both_paths(spark):
    """json-typed (parsed) source column: struct expanded via implicit
    to_json on both physical paths; kept source stays its parsed type."""
    from pyspark.sql import functions as F

    from embulk_filter_expand_json_spark import expand_json

    df = spark.range(3).select(
        F.col("id"),
        F.struct(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
            (F.col("id") * 10).alias("score"),
        ).alias("payload"),
    )
    cfg = {
        "json_column_name": "payload",
        "keep_expanding_json_column": True,
        "expanded_columns": [
            {"name": "name", "type": "string"},
            {"name": "score", "type": "long"},
        ],
    }
    for mode in ("catalyst", "arrow"):
        out = expand_json(df, cfg, mode=mode).orderBy("id").collect()
        assert [(r["name"], r["score"]) for r in out] == [
            ("u0", 0), ("u1", 10), ("u2", 20)
        ], mode
        assert out[0]["payload"]["name"] == "u0"  # struct passthrough kept


def test_catalyst_expr_cache_keys_on_tz_and_columns(spark):
    """The catalyst expression cache must MISS when the session timezone or
    the input column set changes — a stale hit would silently parse
    timestamps in the wrong zone or take the json_tuple fast path against
    a colliding cN column."""
    from embulk_filter_expand_json_spark import expand_json
    from embulk_filter_expand_json_spark.operators import expand as E

    cfg = {
        "json_column_name": "doc",
        "expanded_columns": [
            {"name": "t", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
            {"name": "k", "type": "long"},
        ],
    }
    df = spark.createDataFrame(
        [('{"t": "2024-06-01 12:00:00", "k": 7}',)], "doc string"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = expand_json(df, cfg, mode="catalyst").collect()[0]["t"]
        n_entries = len(E._CATALYST_EXPR_CACHE)
        # same plan + tz: cache hit, identical result
        assert (
            expand_json(df, cfg, mode="catalyst").collect()[0]["t"] == utc
        )
        assert len(E._CATALYST_EXPR_CACHE) == n_entries
        # different session tz: separate cache entry (the cast expressions
        # embed session-tz corrections), while the parsed INSTANT stays
        # identical — the engine's session-tz-invariance contract. A stale
        # UTC-keyed hit under Tokyo would shift the instant by -9h.
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = expand_json(df, cfg, mode="catalyst").collect()[0]["t"]
        assert len(E._CATALYST_EXPR_CACHE) == n_entries + 1
        assert tokyo == utc  # same instant, rendered identically
        # different input columns: new entry, same values
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df2 = df.withColumn("extra", F.lit(1))
        assert (
            expand_json(df2, cfg, mode="catalyst").collect()[0]["t"] == utc
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
