"""Goldens ported from /root/reference/es6-test/unit/soql.js and
es6-test/unit/merger.js:464-480 (column dedup)."""

from georay.soql import (
    clean_dbf_text,
    guess_kml_value,
    launder_name,
    rename_columns,
    soql_type_for,
    unify_ctype,
)


def test_launder_snake_case():
    # es6-test/unit/soql.js:10-37
    assert launder_name("foo") == "foo"
    assert launder_name("fooBar") == "foo_bar"
    assert launder_name("foo bar") == "foo_bar"
    assert launder_name("FOOBAR") == "foobar"
    assert launder_name("         foobar") == "foobar"
    assert launder_name("FooBar") == "foo_bar"


def test_launder_leading_digit():
    assert launder_name("1_foo") == "_1_foo"
    assert launder_name("_1_foo") == "_1_foo"  # idempotent


def test_launder_misc():
    assert launder_name("A_STRING") == "a_string"
    assert launder_name("a string") == "a_string"
    assert launder_name("A_string") == "a_string"
    assert launder_name("the_geom") == "the_geom"


def test_rename_columns_dedup():
    # reference layer.js:58-74 doc example + merger.js:464-480
    assert rename_columns(["foo_bar", "foo_bar", "foo_bar"]) == [
        "foo_bar",
        "foo_bar_1",
        "foo_bar_2",
    ]
    laundered = [launder_name(n) for n in ["a_string", "A_STRING", "A_string", "a string"]]
    assert rename_columns(laundered) == ["a_string", "a_string_1", "a_string_2", "a_string_3"]


def test_rename_columns_existing_suffix():
    # a column already ending _1 colliding with a generated name
    assert rename_columns(["a", "a", "a_1"]) == ["a", "a_1", "a_2"]


def test_unify():
    assert unify_ctype("null", "number") == "number"
    assert unify_ctype("number", "null") == "number"
    assert unify_ctype("number", "number") == "number"
    assert unify_ctype("number", "string") is None


def test_soql_type_for():
    assert soql_type_for(None) == "null"
    assert soql_type_for(True) == "boolean"
    assert soql_type_for(2) == "number"
    assert soql_type_for(2.2) == "number"
    assert soql_type_for("x") == "string"
    assert soql_type_for([1, 2]) == "array"


def test_kml_guessing():
    # reference kml.js:392-396 + unit/kml.js:40-107: Number() parseable ->
    # number, '' -> null, booleans NOT guessed, '1 - 2' stays text
    assert guess_kml_value("2") == ("number", 2.0)
    assert guess_kml_value("2.2") == ("number", 2.2)
    assert guess_kml_value("") == ("null", None)
    assert guess_kml_value("false") == ("string", "false")
    assert guess_kml_value("1 - 2") == ("string", "1 - 2")
    assert guess_kml_value("first value") == ("string", "first value")


def test_dbf_text():
    assert clean_dbf_text("\u0000") == ""
    assert clean_dbf_text("x ") == "x "
