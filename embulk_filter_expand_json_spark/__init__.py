"""PySpark-native CDC/ingest engine with embulk-filter-expand_json semantics.

A brand-new engine (not a port): the reference
(`embulk/embulk-filter-expand_json`, Java, /root/reference) defines the
*semantics* of the JSON-expansion operator; this package re-expresses them
Spark-first — driver-side static planning, Catalyst fast paths, and
Arrow-vectorized pandas UDFs — and adds the CDC/incremental-ingest engine
layer (change-stream replay, last-writer-wins dedup, skew salting,
exactly-once lake MERGE, schema evolution, checkpointed offsets) that the
reference delegates to the Embulk framework.
"""

from embulk_filter_expand_json_spark.plans.expand_plan import (  # noqa: F401
    ConfigException,
    SchemaConfigException,
    DataException,
    ExpandConfig,
    ExpandedColumn,
    plan_expansion,
)
from embulk_filter_expand_json_spark.operators.expand import expand_json  # noqa: F401

__version__ = "0.1.0"
