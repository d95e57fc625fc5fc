"""Plan-time layer of the JSON-expansion operator (pure Python, no Spark).

This is the reference's ``FilterPlugin.transaction()`` reborn as a pure
function: typed config -> validation -> static output schema. Semantics
mirror /root/reference/src/main/java/org/embulk/filter/expand_json/
ExpandJsonFilterPlugin.java (cited per rule below); the *implementation* is
new and Spark-native (StructType out, picklable plan object shipped to
executors via closure capture — the analog of Embulk's TaskSource dump,
ExpandJsonFilterPlugin.java:124,131-136).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence

from pyspark.sql import types as T


class ConfigException(ValueError):
    """Plan-time configuration error (reference: org.embulk.config.ConfigException)."""


class SchemaConfigException(ConfigException):
    """Unknown column referenced (reference: org.embulk.spi.SchemaConfigException)."""


class DataException(RuntimeError):
    """Runtime data error (reference: org.embulk.spi.DataException)."""


#: Embulk's six column types (SURVEY.md §1.2) -> Spark types.
#: ``json`` maps to a string column holding canonical compact JSON text.
EMBULK_TO_SPARK_TYPE: Mapping[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "json": T.StringType(),
}

DEFAULT_ROOT = "$."
DEFAULT_TIMEZONE = "UTC"
DEFAULT_TIMESTAMP_FORMAT = "%Y-%m-%d %H:%M:%S.%N %z"
DEFAULT_DATE = "1970-01-01"

#: Accepted ``cache_provider`` names. The reference installs a process-global
#: Jayway compiled-path cache (ExpandJsonFilterPlugin.java:210-243); our
#: engine compiles each path exactly once per executor closure, so both
#: providers are accepted for config parity and ignored at runtime.
_KNOWN_CACHE_PROVIDERS = {"lru", "noop"}


@dataclass(frozen=True)
class ExpandedColumn:
    """One entry of ``expanded_columns`` (ExpandJsonFilterPlugin.java:68-69).

    ``name`` is the JsonPath suffix appended to ``root``
    (FilteredPageOutput.java:183) and simultaneously the output column name.
    """

    name: str
    type: str
    format: Optional[str] = None
    timezone: Optional[str] = None
    date: Optional[str] = None

    def __post_init__(self) -> None:
        if self.type not in EMBULK_TO_SPARK_TYPE:
            raise ConfigException(
                f"Unknown type '{self.type}' for column '{self.name}'; "
                f"must be one of {sorted(EMBULK_TO_SPARK_TYPE)}"
            )


@dataclass(frozen=True)
class ExpandConfig:
    """Typed config — the reference's PluginTask (ExpandJsonFilterPlugin.java:58-96)."""

    json_column_name: str
    expanded_columns: Sequence[ExpandedColumn]
    root: str = DEFAULT_ROOT
    default_timezone: str = DEFAULT_TIMEZONE
    default_timestamp_format: str = DEFAULT_TIMESTAMP_FORMAT
    default_date: str = DEFAULT_DATE
    stop_on_invalid_record: bool = False
    keep_expanding_json_column: bool = False
    cache_provider: Optional[str] = None
    #: 'abort' (reference parity: broken top-level JSON always raises,
    #: regardless of stop_on_invalid_record — FilteredPageOutput.java:257,
    #: TestExpandJsonFilterPlugin.java:1039-1081) or 'invalid_record'
    #: (route to the invalid-record channel instead).
    malformed_json_policy: str = "abort"

    def __post_init__(self) -> None:
        if self.malformed_json_policy not in ("abort", "invalid_record"):
            raise ConfigException(
                "malformed_json_policy must be 'abort' or 'invalid_record', "
                f"got {self.malformed_json_policy!r}"
            )

    @staticmethod
    def from_dict(raw: Mapping) -> "ExpandConfig":
        """Build from a YAML-ish dict, replicating the reference's config
        mapping errors (required fields, deprecated ``time_zone``)."""
        if "time_zone" in raw:
            # ExpandJsonFilterPlugin.java:103-105
            raise ConfigException(
                "'time_zone' option will be deprecated; use 'default_timezone' option instead"
            )
        for required in ("json_column_name", "expanded_columns"):
            if required not in raw:
                # message shape follows the reference's ConfigMapper error
                # (asserted at TestExpandJsonFilterPlugin.java:160-165, 218-221)
                raise ConfigException(
                    f"Field '{required}' is required but not set"
                )
        cols = []
        for c in raw["expanded_columns"]:
            if isinstance(c, ExpandedColumn):
                cols.append(c)
            else:
                unknown = set(c) - {"name", "type", "format", "timezone", "date"}
                if unknown:
                    raise ConfigException(
                        f"Unknown expanded_columns options {sorted(unknown)} for '{c.get('name')}'"
                    )
                cols.append(ExpandedColumn(**c))
        known = {
            "json_column_name", "expanded_columns", "root", "default_timezone",
            "default_timestamp_format", "default_date", "stop_on_invalid_record",
            "keep_expanding_json_column", "cache_provider", "type",
            "malformed_json_policy",
        }
        extra = set(raw) - known
        if extra:
            raise ConfigException(f"Unknown config options: {sorted(extra)}")
        return ExpandConfig(
            json_column_name=raw["json_column_name"],
            expanded_columns=tuple(cols),
            root=raw.get("root", DEFAULT_ROOT),
            default_timezone=raw.get("default_timezone", DEFAULT_TIMEZONE),
            default_timestamp_format=raw.get(
                "default_timestamp_format", DEFAULT_TIMESTAMP_FORMAT
            ),
            default_date=raw.get("default_date", DEFAULT_DATE),
            stop_on_invalid_record=bool(raw.get("stop_on_invalid_record", False)),
            keep_expanding_json_column=bool(
                raw.get("keep_expanding_json_column", False)
            ),
            cache_provider=raw.get("cache_provider"),
            malformed_json_policy=raw.get("malformed_json_policy", "abort"),
        )


@dataclass(frozen=True)
class ColumnSpec:
    """Executor-side descriptor for one expanded column — the analog of the
    reference's precomputed ExpandedColumn bindings (FilteredPageOutput.java:168-190)."""

    name: str
    json_path: str  # root + name (FilteredPageOutput.java:183)
    type: str  # embulk type name
    timestamp_format: Optional[str] = None  # resolved (column or default)
    timezone: str = DEFAULT_TIMEZONE
    date: str = DEFAULT_DATE


@dataclass(frozen=True)
class ExpandPlan:
    """The full, picklable expansion plan shipped to executors."""

    json_column_name: str
    specs: Sequence[ColumnSpec]
    output_schema: T.StructType
    input_schema: T.StructType
    stop_on_invalid_record: bool
    keep_expanding_json_column: bool
    #: names of pass-through input columns, in input order
    passthrough: Sequence[str] = field(default_factory=tuple)
    malformed_json_policy: str = "abort"
    #: True when the source column is a parsed struct/map/array (the Spark
    #: analog of Embulk's json-typed input) — the operator re-serializes it
    #: through to_json before extraction (FilteredPageOutput.java:324-332)
    source_is_json_typed: bool = False


def plan_expansion(config: ExpandConfig, input_schema: T.StructType) -> ExpandPlan:
    """Validate config against the input schema and build the static output
    schema — the reference's transaction() (ExpandJsonFilterPlugin.java:98-125).

    Output column order replicates buildOutputSchema
    (ExpandJsonFilterPlugin.java:139-184): input columns in order; at the JSON
    column's position, the JSON column itself iff keep_expanding_json_column,
    then every expanded column in config order.
    """
    if config.cache_provider is not None:
        # parity with setCacheProvider (ExpandJsonFilterPlugin.java:210-243):
        # 'LRU'/'NOOP' by name, else a user-provided provider class loaded by
        # reflection (testUseUserDefiledCacheProvider,
        # TestExpandJsonFilterPlugin.java:355-372). Our analog of reflection
        # is importing a dotted Python path; like the reference's providers,
        # the object is accepted-and-ignored at runtime (paths compile once
        # per executor closure, strictly better than a shared cache).
        name = config.cache_provider
        if name.lower() not in _KNOWN_CACHE_PROVIDERS:
            mod, _, attr = name.rpartition(".")
            try:
                if not mod:
                    raise ImportError(name)
                import importlib

                getattr(importlib.import_module(mod), attr)
            except (ImportError, AttributeError) as exc:
                raise ConfigException(
                    f"Cache Provider '{name}' is not supported: use 'LRU', "
                    "'NOOP', or an importable provider class path."
                ) from exc

    names = [f.name for f in input_schema.fields]
    if config.json_column_name not in names:
        # ExpandJsonFilterPlugin.java:114 via Schema.lookupColumn
        raise SchemaConfigException(
            f"Column '{config.json_column_name}' is not found"
        )
    src_field = input_schema[config.json_column_name]
    source_is_json_typed = isinstance(
        src_field.dataType, (T.StructType, T.MapType, T.ArrayType)
    )
    if not isinstance(src_field.dataType, T.StringType) and not source_is_json_typed:
        # ExpandJsonFilterPlugin.java:115-119: input must be string or json.
        # The Spark-native analog of Embulk's json type is a parsed
        # struct/map/array column — accepted and re-serialized through
        # to_json, mirroring the reference's toJson() re-serialization
        # (FilteredPageOutput.java:324-332).
        raise ConfigException(
            f"Column type must be string or json: {config.json_column_name}"
        )

    # validateExpandedColumns (ExpandJsonFilterPlugin.java:186-196)
    seen: set = set()
    for col in config.expanded_columns:
        if col.name in seen:
            raise ConfigException(
                f"Column config for '{col.name}' is duplicated at 'expanded_columns' option"
            )
        seen.add(col.name)
        if col.type == "timestamp":
            # plan-time format validation: an unsupported Ruby token must
            # fail here (the reference's transaction() phase), not as an
            # executor-side exception mid-job on the Arrow path
            from embulk_filter_expand_json_spark.functions.timefmt import (
                UnsupportedTimestampFormat,
                validate_ruby_format,
            )

            fmt = col.format or config.default_timestamp_format
            try:
                validate_ruby_format(fmt)
            except UnsupportedTimestampFormat as exc:
                raise ConfigException(
                    f"Unsupported timestamp format {fmt!r} for column "
                    f"'{col.name}': {exc}"
                ) from exc

    specs = tuple(
        ColumnSpec(
            name=c.name,
            json_path=config.root + c.name,
            type=c.type,
            timestamp_format=(
                (c.format or config.default_timestamp_format)
                if c.type == "timestamp"
                else None
            ),
            timezone=c.timezone or config.default_timezone,
            date=c.date or config.default_date,
        )
        for c in config.expanded_columns
    )

    out_fields = []
    passthrough = []
    for f in input_schema.fields:
        if f.name == config.json_column_name:
            if config.keep_expanding_json_column:
                out_fields.append(f)
                passthrough.append(f.name)
            for c in config.expanded_columns:
                out_fields.append(
                    T.StructField(c.name, EMBULK_TO_SPARK_TYPE[c.type], True)
                )
        else:
            out_fields.append(f)
            passthrough.append(f.name)

    # validateOutputSchema (ExpandJsonFilterPlugin.java:198-208)
    out_seen: set = set()
    for f in out_fields:
        if f.name in out_seen:
            raise ConfigException(
                f"Output column '{f.name}' is duplicated. Please check "
                "'expanded_columns' option and Input plugin's settings."
            )
        out_seen.add(f.name)

    return ExpandPlan(
        json_column_name=config.json_column_name,
        specs=specs,
        output_schema=T.StructType(out_fields),
        input_schema=input_schema,
        stop_on_invalid_record=config.stop_on_invalid_record,
        keep_expanding_json_column=config.keep_expanding_json_column,
        passthrough=tuple(passthrough),
        malformed_json_policy=config.malformed_json_policy,
        source_is_json_typed=source_is_json_typed,
    )
