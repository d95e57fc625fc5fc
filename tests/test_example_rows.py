"""The reference's example workload (example/config.yml:19-32) end-to-end:
9 expanded columns incl. nested paths, array indexes and object/array ->
JSON-text serialization, verified against an in-test Python oracle on both
physical strategies."""

import datetime
import json

import pytest

from embulk_filter_expand_json_spark import expand_json
from embulk_filter_expand_json_spark.sources.examplegen import (
    generate_example_rows,
)

CFG = {
    "json_column_name": "json_payload",
    "root": "$.",
    "expanded_columns": [
        {"name": "phone_numbers", "type": "string"},
        {"name": "app_id", "type": "long"},
        {"name": "point", "type": "double"},
        {"name": "created_at", "type": "timestamp", "format": "%Y-%m-%d"},
        {"name": "profile.anniversary.et", "type": "string"},
        {"name": "profile.anniversary", "type": "string"},
        {"name": "profile.like_words[1]", "type": "string"},
        {"name": "profile.like_words[2]", "type": "string"},
        {"name": "profile.like_words", "type": "string"},
    ],
}


@pytest.mark.parametrize("mode", ["catalyst", "arrow"])
def test_example_config_both_modes(spark, mode):
    df = generate_example_rows(spark, n=50, seed=42)
    raw = {r["id"]: json.loads(r["json_payload"]) for r in df.collect()}
    out = expand_json(df, CFG, mode=mode)
    assert out.columns == [
        "time", "id", "name", "score",
        "phone_numbers", "app_id", "point", "created_at",
        "profile.anniversary.et", "profile.anniversary",
        "profile.like_words[1]", "profile.like_words[2]",
        "profile.like_words",
    ]
    rows = out.collect()
    assert len(rows) == 50
    compact = lambda v: json.dumps(v, separators=(",", ":"))  # noqa: E731
    for r in rows:
        doc = raw[r["id"]]
        assert r["phone_numbers"] == compact(doc["phone_numbers"])
        assert r["app_id"] == doc["app_id"]
        assert r["point"] == pytest.approx(doc["point"])
        want_ts = datetime.datetime.strptime(doc["created_at"], "%Y-%m-%d")
        assert r["created_at"] == want_ts
        assert r["profile.anniversary.et"] == doc["profile"]["anniversary"]["et"]
        assert r["profile.anniversary"] == compact(doc["profile"]["anniversary"])
        assert r["profile.like_words[1]"] == doc["profile"]["like_words"][1]
        assert r["profile.like_words[2]"] == doc["profile"]["like_words"][2]
        assert r["profile.like_words"] == compact(doc["profile"]["like_words"])


def test_example_rows_deterministic(spark):
    a = generate_example_rows(spark, n=10).collect()
    b = generate_example_rows(spark, n=10).collect()
    assert a == b
