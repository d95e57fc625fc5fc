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
