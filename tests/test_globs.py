"""P6 glob include/exclude filters vs the reference's PathFilter
semantics (detector.rs:92-200; fixture layout mirrors the reference's
discovery tests, src/systems/discovery.rs:379-428)."""

from __future__ import annotations

import re

import pytest

from uncp_spark.functions.globs import (
    GlobError,
    glob_to_regex,
    path_glob_filter,
)

# the reference's test directory layout (discovery.rs:379-395) plus a
# few extras that exercise depth and naming edge cases
PATHS = [
    "test.txt",
    "image.jpg",
    "data.bin",
    "subdir/nested.txt",
    "subdir/deep/very.txt",
    "subdir/image.png",
    "src/main.rs",
    "src/lib.rs",
    "target/debug/main.o",
    "a/b",
    "a/x/b",
    "a/x/y/b",
]


def matches(pattern: str, literal_separator: bool = False) -> list[str]:
    rx = re.compile(glob_to_regex(pattern, literal_separator))
    return [p for p in PATHS if rx.match(p)]


def test_star_crosses_separator_by_default():
    # globset literal_separator=false (the reference's default): '*'
    # matches '/' too, so '*.txt' matches nested files
    assert matches("*.txt") == [
        "test.txt", "subdir/nested.txt", "subdir/deep/very.txt"]


def test_star_literal_separator():
    assert matches("*.txt", literal_separator=True) == ["test.txt"]
    assert matches("subdir/*.txt", literal_separator=True) == ["subdir/nested.txt"]


def test_double_star():
    assert matches("**/*.txt", literal_separator=True) == [
        "test.txt", "subdir/nested.txt", "subdir/deep/very.txt"]
    assert matches("subdir/**", literal_separator=True) == [
        "subdir/nested.txt", "subdir/deep/very.txt", "subdir/image.png"]
    # a/**/b matches a/b too (zero components)
    assert matches("a/**/b", literal_separator=True) == ["a/b", "a/x/b", "a/x/y/b"]


def test_question_and_classes():
    assert matches("????.txt") == ["test.txt"]
    assert matches("data.[bc]in") == ["data.bin"]
    assert matches("data.[!xyz]in") == ["data.bin"]


def test_alternation():
    assert matches("*.{jpg,png}") == ["image.jpg", "subdir/image.png"]
    assert matches("src/{main,lib}.rs", literal_separator=True) == [
        "src/main.rs", "src/lib.rs"]


def test_regex_metachars_are_literal():
    assert matches("data.bin") == ["data.bin"]
    rx = re.compile(glob_to_regex("a+b(c)^$.bin"))
    assert rx.match("a+b(c)^$.bin")
    assert not rx.match("aab(c)^$.bin")


def test_invalid_patterns_raise():
    with pytest.raises(GlobError):
        glob_to_regex("")
    with pytest.raises(GlobError):
        glob_to_regex("[unterminated")
    with pytest.raises(GlobError):
        glob_to_regex("{a,b")
    with pytest.raises(GlobError):
        glob_to_regex("a}b")


def test_spark_include_exclude(spark):
    df = spark.createDataFrame([(p,) for p in PATHS], ["path"])
    # reference semantics: include must match >=1, exclude must match none
    out = path_glob_filter(
        df, include=["*.txt", "*.rs"], exclude=["subdir/*"],
    )
    got = sorted(r.path for r in out.collect())
    assert got == ["src/lib.rs", "src/main.rs", "test.txt"]

    # empty include = everything; exclude-only
    out2 = path_glob_filter(df, exclude=["*.txt", "*.o"])
    got2 = sorted(r.path for r in out2.collect())
    assert got2 == ["a/b", "a/x/b", "a/x/y/b", "data.bin",
                    "image.jpg", "src/lib.rs", "src/main.rs",
                    "subdir/image.png"]

    # no patterns = identity
    assert path_glob_filter(df).count() == len(PATHS)
