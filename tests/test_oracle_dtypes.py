"""The local mirror must be dtype-sensitive (round-5 quality_gopher
lesson): an int32 Spark column whose oracle is BIGINT must FAIL even
when every value matches, because the driver's typed hash fails on it."""

import pytest

from .oracle_util import assert_dtypes_match, _duck_type_for


def test_int_vs_bigint_fails():
    with pytest.raises(AssertionError, match="dtype skew"):
        assert_dtypes_match([("n", "int")], ["n"], ["BIGINT"])


def test_matching_types_pass():
    assert_dtypes_match(
        [("n", "bigint"), ("x", "double"), ("s", "string"), ("b", "boolean")],
        ["n", "x", "s", "b"],
        ["BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN"],
    )


def test_array_types():
    assert _duck_type_for("array<bigint>") == "BIGINT[]"
    assert _duck_type_for("array<string>") == "VARCHAR[]"
    with pytest.raises(AssertionError, match="dtype skew"):
        assert_dtypes_match([("a", "array<int>")], ["a"], ["BIGINT[]"])


def test_unmapped_types_skipped():
    assert_dtypes_match([("m", "map<string,int>")], ["m"], ["MAP(VARCHAR, INTEGER)"])
