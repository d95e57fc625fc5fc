"""Property-based tests (hypothesis) for the pure-Python layers.

- The JsonPath engine agrees with jsonpath_ng on the grammar subset both
  support (definite field/index paths and wildcards) over arbitrary JSON.
- Cast invariants: long-cast results always fit int64 and match Java
  truncation; stringify/parse round-trips for containers; the Java double
  formatter round-trips through float().
"""

import json
import math

from hypothesis import given, settings, strategies as st

from embulk_filter_expand_json_spark.functions.casts import (
    _parse_long_slow,
    dumps_java,
    java_double_to_string,
    loads_strict,
    stringify_extracted,
)
from embulk_filter_expand_json_spark.functions.jsonpath import compile_path

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(st.characters(codec="ascii", exclude_characters='."[]\\\''),
                    min_size=1, max_size=6),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(
    doc=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), json_values, max_size=3
    ),
    path_keys=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
)
def test_definite_paths_agree_with_jsonpath_ng(doc, path_keys):
    import jsonpath_ng

    path = "$." + ".".join(path_keys)
    ours = compile_path(path).read(doc)
    matches = [m.value for m in jsonpath_ng.parse(path).find(doc)]
    theirs = matches[0] if matches else None
    assert ours == theirs


@settings(max_examples=200, deadline=None)
@given(doc=json_values)
def test_wildcard_matches_exactly(doc):
    # (jsonpath_ng is NOT usable as an oracle here: its wildcard silently
    # drops falsy matches — [False] -> []. Jayway keeps every element, and
    # so do we.)
    ours = compile_path("$.*").read(doc)
    if isinstance(doc, dict):
        assert ours == list(doc.values())
    elif isinstance(doc, list):
        assert ours == doc
    else:
        assert ours == []


@settings(max_examples=300, deadline=None)
@given(v=st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_java_double_string_roundtrips(v):
    s = java_double_to_string(v)
    assert float(s) == v


@settings(max_examples=300, deadline=None)
@given(v=st.integers(min_value=-(2**80), max_value=2**80))
def test_long_cast_always_fits_int64(v):
    got = _parse_long_slow(str(v))
    assert got is not None
    assert -(2**63) <= got <= 2**63 - 1
    if -(2**63) <= v <= 2**63 - 1:
        assert got == v  # exact when in range (no float round-trip)


@settings(max_examples=200, deadline=None)
@given(doc=json_values)
def test_container_serialization_roundtrips(doc):
    s = stringify_extracted(doc)
    if isinstance(doc, (dict, list)):
        back = loads_strict(s)
        # float formatting may change spelling but never the value
        assert json.dumps(back, sort_keys=True) == json.dumps(doc, sort_keys=True)


@settings(max_examples=200, deadline=None)
@given(doc=json_values)
def test_dumps_java_is_valid_json(doc):
    if isinstance(doc, float) and (math.isnan(doc) or math.isinf(doc)):
        return
    assert loads_strict(dumps_java(doc)) == doc