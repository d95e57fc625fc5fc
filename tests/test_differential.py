"""Differential fuzzing: the Catalyst and Arrow strategies are independent
implementations of the same reference semantics, so on ANY input they must
produce identical rows. 400 seeded random documents spanning scalars,
exponent notation, overflow, unicode, nested structures, missing keys,
null/empty/malformed docs — one Spark job per path, outputs compared
row-for-row."""

import json
import math
import random

import pytest

from embulk_filter_expand_json_spark import expand_json

SEED = 20260816


def _rand_scalar(rng: random.Random):
    return rng.choice(
        [
            lambda: rng.randint(-(10**12), 10**12),
            lambda: rng.randint(-(2**70), 2**70),  # beyond int64
            lambda: round(rng.uniform(-1e6, 1e6), 6),
            lambda: float(f"{rng.uniform(1, 10):.4f}e{rng.randint(-30, 30)}"),
            lambda: rng.choice([True, False]),
            lambda: None,
            lambda: rng.choice(
                ["", "true", "TRUE", "false", "abcde", "1_0", "NaN",
                 "Infinity", "12345e3", "-1.234e-5", "0x1F", " 7", "7 ",
                 "héllo wörld", "日本語", '"quoted"', "[1,2]", "{}"]
            ),
            lambda: str(rng.randint(-(10**18), 10**18)),
        ]
    )()


def _rand_doc(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.05:
        return None
    if r < 0.08:
        return ""
    if r < 0.12:
        return '{"broken": '  # malformed
    doc = {}
    for key in ("a", "b", "c", "d"):
        if rng.random() < 0.8:
            v = _rand_scalar(rng)
            if rng.random() < 0.15:
                v = {"x": _rand_scalar(rng), "y": [_rand_scalar(rng)]}
            doc[key] = v
    return json.dumps(doc, ensure_ascii=False)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_equal(a: tuple, b: tuple) -> bool:
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            # documented deviation: for JSON integers beyond int64, Spark's
            # get_json_object (Jackson) renders them via double (15 sig
            # digits) while Python/json-smart keep full digits — a <=2 ulp
            # difference once cast to double
            if not math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12):
                return False
        elif x != y:
            return False
    return True


@pytest.mark.parametrize(
    "types",
    [
        {"a": "string", "b": "long", "c": "double", "d": "boolean"},
        {"a": "json", "b": "double", "c": "string", "d": "long"},
    ],
    ids=["mix1", "mix2"],
)
def test_catalyst_and_arrow_agree_on_random_docs(spark, types):
    rng = random.Random(SEED)
    docs = [_rand_doc(rng) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "row_id long, _c0 string"
    )
    cfg = {
        "json_column_name": "_c0",
        "expanded_columns": [{"name": k, "type": t} for k, t in types.items()],
        "malformed_json_policy": "invalid_record",
        "stop_on_invalid_record": False,
    }
    results = {}
    for mode in ("catalyst", "arrow"):
        rows = expand_json(df, cfg, mode=mode).collect()
        results[mode] = {
            r["row_id"]: tuple(_norm(r[k]) for k in types) for r in rows
        }
    cat, arr = results["catalyst"], results["arrow"]
    assert set(cat) == set(arr), (
        f"row-set diverges: only-catalyst={sorted(set(cat) - set(arr))[:5]} "
        f"only-arrow={sorted(set(arr) - set(cat))[:5]}"
    )
    for rid in cat:
        assert _rows_equal(cat[rid], arr[rid]), (
            f"row {rid}: doc={docs[rid]!r} catalyst={cat[rid]} arrow={arr[rid]}"
        )
    # sanity: the fuzz actually exercised drops and survivors
    assert 0 < len(cat) < len(docs)