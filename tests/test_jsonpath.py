"""JsonPath engine unit tests — grammar pinned by the reference's flagship
suite (TestExpandJsonFilterPlugin.java:590-680, 855-1036) plus Jayway
option semantics (DEFAULT_PATH_LEAF_TO_NULL + SUPPRESS_EXCEPTIONS,
FilteredPageOutput.java:223-229)."""

import json

import pytest

from embulk_filter_expand_json_spark.functions.jsonpath import (
    JsonPathSyntaxError,
    compile_path,
)

STORE = {
    "store": {
        "book": [
            {"author": "Nigel Rees", "title": "Sayings of the Century", "price": 8.95},
            {"author": "Evelyn Waugh", "title": "Sword of Honour", "price": 12.99},
            {
                "author": "Herman Melville",
                "title": "Moby Dick",
                "isbn": "0-553-21311-3",
                "price": 8.99,
            },
            {
                "author": "J. R. R. Tolkien",
                "title": "The Lord of the Rings",
                "isbn": "0-395-19395-8",
                "price": 22.99,
            },
        ],
        "bicycle": {"color": "red", "price": 19.95},
    },
    "expensive": 10,
}

DOC = {"_j7": STORE, "flag": True, "n": 2, "s": "v5", "nul": None}


def read(path, doc=DOC):
    return compile_path(path).read(doc)


def compact(v):
    return json.dumps(v, separators=(",", ":"))


def test_definite_scalars():
    assert read("$.flag") is True
    assert read("$.n") == 2
    assert read("$.s") == "v5"
    assert read("$.nul") is None


def test_definite_missing_is_none():
    assert read("$.absent") is None
    assert read("$.absent.deep[3]") is None
    assert read("$._j7.store.book[99].author") is None


def test_index_and_negative_index():
    assert read("$._j7.store.book[2].author") == "Herman Melville"
    assert read("$._j7.store.book[-1].author") == "J. R. R. Tolkien"


def test_bracket_quoted_fields():
    assert read("$['_j7']['expensive']") == 10
    assert read('$["_j7"]["store"]["bicycle"]["color"]') == "red"


def test_wildcard_array():
    got = read("$._j7.store.book[*].author")
    assert got == [
        "Nigel Rees",
        "Evelyn Waugh",
        "Herman Melville",
        "J. R. R. Tolkien",
    ]


def test_wildcard_object():
    got = read("$._j7.store.bicycle.*")
    assert got == ["red", 19.95]


def test_recursive_descent():
    got = read("$._j7..price")
    assert sorted(map(float, got)) == sorted([8.95, 12.99, 8.99, 22.99, 19.95])


def test_filter_comparison_with_root_ref():
    got = read("$._j7..book[?(@.price <= $['_j7']['expensive'])].author")
    assert got == ["Nigel Rees", "Herman Melville"]


def test_filter_existence():
    got = read("$._j7..book[?(@.isbn)]")
    assert compact(got) == (
        '[{"author":"Herman Melville","title":"Moby Dick",'
        '"isbn":"0-553-21311-3","price":8.99},'
        '{"author":"J. R. R. Tolkien","title":"The Lord of the Rings",'
        '"isbn":"0-395-19395-8","price":22.99}]'
    )


def test_filter_regex_case_insensitive():
    got = read("$._j7..book[?(@.author =~ /.*REES/i)].title")
    assert got == ["Sayings of the Century"]


def test_filter_and_or_not():
    got = read("$._j7.store.book[?(@.price > 8 && @.price < 9)].title")
    assert got == ["Sayings of the Century", "Moby Dick"]
    got = read("$._j7.store.book[?(@.price < 9 || @.price > 20)].price")
    assert got == [8.95, 8.99, 22.99]
    got = read("$._j7.store.book[?(!(@.isbn))].author")
    assert got == ["Nigel Rees", "Evelyn Waugh"]


def test_filter_string_equality():
    got = read("$._j7.store.book[?(@.author == 'Evelyn Waugh')].price")
    assert got == [12.99]
    got = read("$._j7.store.book[?(@.author != 'Evelyn Waugh')].price")
    assert got == [8.95, 8.99, 22.99]


def test_filter_in_nin():
    got = read("$._j7.store.book[?(@.author in ['Nigel Rees','Evelyn Waugh'])].price")
    assert got == [8.95, 12.99]


def test_index_union_and_slice():
    assert read("$._j7.store.book[0,2].price") == [8.95, 8.99]
    assert read("$._j7.store.book[1:3].price") == [12.99, 8.99]
    assert read("$._j7.store.book[:2].price") == [8.95, 12.99]
    assert read("$._j7.store.book[-1:].price") == [22.99]


def test_indefinite_no_match_is_empty_list():
    assert read("$._j7.store.nothing[*]") == []
    assert read("$._j7.store.book[?(@.price > 100)]") == []


def test_definiteness_classification():
    assert compile_path("$.a.b[2].c").is_definite
    assert not compile_path("$.a[*]").is_definite
    assert not compile_path("$..a").is_definite
    assert not compile_path("$.a[?(@.x)]").is_definite
    assert not compile_path("$.a[0,1]").is_definite


def test_syntax_errors():
    for bad in ("$.a[", "a.b", "$.a[?(@.x", "$.a[]"):
        with pytest.raises(JsonPathSyntaxError):
            compile_path(bad)


def test_field_on_non_object_dropped():
    assert read("$.n.x") is None
    assert read("$._j7.store.book[*].author.title") == []


def test_filter_ident_trims_at_operators():
    # '[?(@.price<10)]' without spaces is legal Jayway — ident stops at '<'
    from embulk_filter_expand_json_spark.functions.jsonpath import compile_path

    cp = compile_path("$.items[?(@.price<10)].name")
    doc = {"items": [{"price": 5, "name": "a"}, {"price": 50, "name": "b"}]}
    assert cp.read(doc) == ["a"]


def test_filter_ambiguous_ident_raises():
    # a field literally named 'a<b' cannot be expressed unquoted — like
    # Jayway we error instead of silently evaluating the prefix field 'a'
    from embulk_filter_expand_json_spark.functions.jsonpath import (
        JsonPathSyntaxError,
        compile_path,
    )
    import pytest

    with pytest.raises(JsonPathSyntaxError):
        compile_path("$.items[?(@.a<b)]")
    # bracket-quoting such names works
    cp = compile_path("$.items[?(@['a<b'] == 1)].name")
    assert cp.read({"items": [{"a<b": 1, "name": "x"}, {"a<b": 2}]}) == ["x"]


# --- Jayway 2.4.0 path functions + size/empty filter operators --------------

def test_tail_length_function():
    # array size, string length, object entry count (Jayway LengthFunction)
    assert compile_path("$.store.book.length()").read(STORE) == 4
    assert compile_path("$.store.book[0].author.length()").read(STORE) == 10
    assert compile_path("$.store.book[0].length()").read(STORE) == 3
    # type mismatch / absent path -> suppressed to null
    assert compile_path("$.store.book[0].price.length()").read(STORE) is None
    assert compile_path("$.nope.length()").read(STORE) is None


def test_tail_length_on_indefinite_path_unwraps_single_match():
    # Jayway's documented '$..book.length() -> 4' shape
    assert compile_path("$..book.length()").read(STORE) == 4


def test_tail_numeric_aggregations():
    prices = [b["price"] for b in STORE["store"]["book"]]
    assert compile_path("$..book[*].price.min()").read(STORE) == min(prices)
    assert compile_path("$..book[*].price.max()").read(STORE) == max(prices)
    assert compile_path("$..book[*].price.sum()").read(STORE) == pytest.approx(
        sum(prices)
    )
    assert compile_path("$..book[*].price.avg()").read(STORE) == pytest.approx(
        sum(prices) / len(prices)
    )
    mean = sum(prices) / len(prices)
    assert compile_path("$..book[*].price.stddev()").read(STORE) == pytest.approx(
        (sum((x - mean) ** 2 for x in prices) / len(prices)) ** 0.5
    )
    # aggregation over a definite array value
    assert compile_path("$.a.sum()").read({"a": [1, 2, 3]}) == 6.0
    # empty aggregation set throws in Jayway -> suppressed to null
    assert compile_path("$.a.min()").read({"a": []}) is None
    assert compile_path("$.a.min()").read({"a": ["x"]}) is None


def test_tail_keys_function():
    assert compile_path("$.store.book[0].keys()").read(STORE) == [
        "author", "title", "price",
    ]
    assert compile_path("$.store.book.keys()").read(STORE) is None


def test_tail_function_must_be_last_step():
    with pytest.raises(JsonPathSyntaxError):
        compile_path("$.store.length().x")


def test_tail_function_path_reports_definite():
    # functions always yield a single value -> definite read shape
    assert compile_path("$..book[*].price.sum()").is_definite
    # a field literally named 'length()' is still addressable bracket-quoted
    assert compile_path("$['length()']").read({"length()": 7}) == 7


def test_filter_size_operator():
    doc = {"items": [{"v": "abcd"}, {"v": [1, 2, 3, 4]}, {"v": "xy"}, {"v": 4}]}
    cp = compile_path("$.items[?(@.v size 4)].v")
    assert cp.read(doc) == ["abcd", [1, 2, 3, 4]]


def test_filter_empty_operator():
    doc = {"items": [{"v": ""}, {"v": []}, {"v": "x"}, {"v": [1]}, {"w": 1}]}
    assert compile_path("$.items[?(@.v empty true)].v").read(doc) == ["", []]
    assert compile_path("$.items[?(@.v empty false)].v").read(doc) == ["x", [1]]


def test_tail_concat_function():
    """Jayway 2.4.0 text.Concatenate: string items of an ARRAY model
    concatenate first (non-strings skipped; non-array models contribute
    nothing), then each parameter appends via toString(). Parameters are
    literals or $-rooted paths."""
    doc = {"first": "Tatu", "last": "Saloranta", "text": ["a", "b", 3],
           "n": 2, "f": 2.5, "flag": True}
    assert (
        compile_path("$.concat($.first, ' ', $.last)").read(doc)
        == "Tatu Saloranta"
    )
    # non-array model ignored; only parameters concatenate
    assert compile_path("$.first.concat(' x')").read(doc) == " x"
    # array model: string items only, then params
    assert compile_path("$.text.concat('-tail')").read(doc) == "ab-tail"
    assert compile_path("$.text.concat()").read(doc) == "ab"
    # toString() conversions: int, double (keeps .0-less repr), boolean
    assert (
        compile_path("$.concat('v=', $.n, '/', $.f, '/', $.flag)").read(doc)
        == "v=2/2.5/true"
    )
    # a null parameter NPEs in Jayway -> suppressed to null
    assert compile_path("$.first.concat($.missing)").read(doc) is None


def test_tail_append_function():
    """Jayway 2.4.0 json.Append: parameters append to an ARRAY model in
    order; any other model passes through unchanged."""
    doc = {"nums": [1, 2, 3], "n": 7}
    assert compile_path("$.nums.append(13)").read(doc) == [1, 2, 3, 13]
    assert compile_path("$.nums.append(4, 5)").read(doc) == [1, 2, 3, 4, 5]
    assert compile_path("$.nums.append('x', true, null)").read(doc) == [
        1, 2, 3, "x", True, None,
    ]
    # path parameter resolves against the document root
    assert compile_path("$.nums.append($.n)").read(doc) == [1, 2, 3, 7]
    # non-array model: identity
    assert compile_path("$.n.append(4)").read(doc) == 7


def test_param_tail_function_syntax_errors():
    for bad in (
        "$.a.concat('x'",        # unterminated args
        "$.a.concat('x' 'y')",   # missing comma
        "$.a.concat(@.b)",       # @-relative params are filter-only
        "$.a.concat(1).x",       # function must stay the last step
    ):
        with pytest.raises(JsonPathSyntaxError):
            compile_path(bad)
