"""Plan-time validation tests — the reference's config-error suite
(TestExpandJsonFilterPlugin.java:151-307) plus output-schema splice order
(:491-542)."""

import pytest
from pyspark.sql import types as T

from embulk_filter_expand_json_spark.plans.expand_plan import (
    ConfigException,
    SchemaConfigException,
    ExpandConfig,
    ExpandedColumn,
    plan_expansion,
)

SCHEMA = T.StructType(
    [
        T.StructField("_c0", T.StringType()),
        T.StructField("_c1", T.StringType()),
    ]
)


def cfg(**kw):
    base = dict(
        json_column_name="_c0",
        expanded_columns=[{"name": "_e0", "type": "string"}],
    )
    base.update(kw)
    return base


def test_config_missing_json_column_name():
    with pytest.raises(ConfigException, match="json_column_name"):
        ExpandConfig.from_dict({"expanded_columns": [{"name": "x", "type": "string"}]})


def test_config_missing_expanded_columns():
    with pytest.raises(ConfigException, match="expanded_columns"):
        ExpandConfig.from_dict({"json_column_name": "_c0"})


def test_config_unknown_column():
    with pytest.raises(SchemaConfigException, match="not found"):
        plan_expansion(
            ExpandConfig.from_dict(cfg(json_column_name="_c5")), SCHEMA
        )


def test_config_bad_source_type():
    schema = T.StructType(
        [T.StructField("_c0", T.LongType()), T.StructField("_c1", T.StringType())]
    )
    with pytest.raises(ConfigException, match="must be string or json"):
        plan_expansion(ExpandConfig.from_dict(cfg()), schema)


def test_config_legacy_time_zone_rejected():
    with pytest.raises(ConfigException, match="time_zone"):
        ExpandConfig.from_dict(cfg(time_zone="UTC"))


def test_config_duplicate_expanded():
    c = cfg(
        expanded_columns=[
            {"name": "_e0", "type": "string"},
            {"name": "_e0", "type": "long"},
        ]
    )
    with pytest.raises(ConfigException, match="duplicated at 'expanded_columns'"):
        plan_expansion(ExpandConfig.from_dict(c), SCHEMA)


def test_config_duplicate_output():
    # expanded column collides with pass-through _c1
    c = cfg(expanded_columns=[{"name": "_c1", "type": "string"}])
    with pytest.raises(ConfigException, match="Output column '_c1' is duplicated"):
        plan_expansion(ExpandConfig.from_dict(c), SCHEMA)


def test_config_unknown_cache_provider():
    with pytest.raises(ConfigException, match="not supported"):
        plan_expansion(
            ExpandConfig.from_dict(cfg(cache_provider="mycache")), SCHEMA
        )


def test_config_known_cache_providers_accepted():
    for name in ("LRU", "noop", "NOOP", "lru"):
        plan_expansion(ExpandConfig.from_dict(cfg(cache_provider=name)), SCHEMA)


def test_config_defaults():
    # testDefaultValue (TestExpandJsonFilterPlugin.java:310-336)
    c = ExpandConfig.from_dict(cfg())
    assert c.root == "$."
    assert c.default_timezone == "UTC"
    assert c.default_timestamp_format == "%Y-%m-%d %H:%M:%S.%N %z"
    assert c.default_date == "1970-01-01"
    assert c.stop_on_invalid_record is False
    assert c.keep_expanding_json_column is False
    assert c.cache_provider is None


def test_config_unknown_type():
    with pytest.raises(ConfigException, match="Unknown type"):
        ExpandedColumn(name="x", type="decimal")


def test_output_schema_order_drop():
    # testExpandJsonKeyToSchema (:491-542): expanded spliced at source position
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("_c0", T.StringType()),
            T.StructField("z", T.StringType()),
        ]
    )
    c = ExpandConfig.from_dict(
        cfg(
            expanded_columns=[
                {"name": "_j1", "type": "boolean"},
                {"name": "_j2", "type": "long"},
            ]
        )
    )
    plan = plan_expansion(c, schema)
    assert [f.name for f in plan.output_schema.fields] == ["a", "_j1", "_j2", "z"]
    assert plan.output_schema["_j1"].dataType == T.BooleanType()
    assert plan.output_schema["_j2"].dataType == T.LongType()


def test_output_schema_order_keep():
    # testExpandedJsonValuesWithKeepJsonColumns (:742-793)
    c = ExpandConfig.from_dict(cfg(keep_expanding_json_column=True))
    plan = plan_expansion(c, SCHEMA)
    assert [f.name for f in plan.output_schema.fields] == ["_c0", "_e0", "_c1"]


def test_json_path_is_root_plus_name():
    c = ExpandConfig.from_dict(cfg(root="$.payload."))
    plan = plan_expansion(c, SCHEMA)
    assert plan.specs[0].json_path == "$.payload._e0"


def test_timestamp_options_resolution():
    c = ExpandConfig.from_dict(
        cfg(
            default_timezone="Asia/Tokyo",
            expanded_columns=[
                {"name": "t1", "type": "timestamp"},
                {
                    "name": "t2",
                    "type": "timestamp",
                    "format": "%Y-%m-%d",
                    "timezone": "UTC",
                    "date": "2000-01-02",
                },
            ],
        )
    )
    plan = plan_expansion(c, SCHEMA)
    t1, t2 = plan.specs
    assert t1.timestamp_format == "%Y-%m-%d %H:%M:%S.%N %z"
    assert t1.timezone == "Asia/Tokyo"
    assert t1.date == "1970-01-01"
    assert t2.timestamp_format == "%Y-%m-%d"
    assert t2.timezone == "UTC"
    assert t2.date == "2000-01-02"


def test_malformed_policy_validation():
    with pytest.raises(ConfigException, match="malformed_json_policy"):
        ExpandConfig.from_dict(cfg(malformed_json_policy="bogus"))


def test_config_json_typed_sources_accepted():
    """Struct/map/array sources are the Spark analog of Embulk's json-typed
    input column (ExpandJsonFilterPlugin.java:114-119) — accepted and
    re-serialized via to_json; other types still rejected."""
    for dt in (
        T.StructType([T.StructField("a", T.LongType())]),
        T.MapType(T.StringType(), T.StringType()),
        T.ArrayType(T.LongType()),
    ):
        schema = T.StructType([T.StructField("_c0", dt)])
        plan = plan_expansion(ExpandConfig.from_dict(cfg()), schema)
        assert plan.source_is_json_typed
    str_plan = plan_expansion(ExpandConfig.from_dict(cfg()), SCHEMA)
    assert not str_plan.source_is_json_typed


def test_config_user_cache_provider_class():
    """Reference parity: a user-provided provider class loads by reflection
    (testUseUserDefiledCacheProvider, TestExpandJsonFilterPlugin.java:355-372)
    — our analog accepts any importable dotted path."""
    plan_expansion(
        ExpandConfig.from_dict(cfg(cache_provider="json.JSONDecoder")), SCHEMA
    )
    with pytest.raises(ConfigException, match="not supported"):
        plan_expansion(
            ExpandConfig.from_dict(cfg(cache_provider="no.such.Provider")),
            SCHEMA,
        )


def test_timestamp_format_validated_at_plan_time():
    """An unsupported Ruby strftime token must fail in plan_expansion (the
    reference's transaction() phase), never as an executor-side error."""
    bad = cfg()
    bad["expanded_columns"] = [
        {"name": "t", "type": "timestamp", "format": "%C%Y"}
    ]
    with pytest.raises(ConfigException, match="Unsupported timestamp format"):
        plan_expansion(ExpandConfig.from_dict(bad), SCHEMA)
    # %s (epoch seconds) and width-modified fractions are supported
    ok = cfg()
    ok["expanded_columns"] = [
        {"name": "t", "type": "timestamp", "format": "%s"},
        {"name": "u", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S.%9N"},
    ]
    plan_expansion(ExpandConfig.from_dict(ok), SCHEMA)
