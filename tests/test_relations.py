"""J4 membership / cross-dimension queries (DESIGN.md:283-288 parity)."""

from __future__ import annotations

from uncp_spark.operators.relations import (
    dup_in_one_dim_unique_in_other,
    groups_containing,
    members_of_groups,
)

GROUPS = [
    ("h1", ["a/x.py", "b/x.py"], 2),
    ("h2", ["c/y.py"], 1),
    ("h3", ["a/x.py", "d/z.py"], 2),
]
GSCHEMA = "key string, file_paths array<string>, file_count int"

FILES = [
    # filename-dup + content-unique (qualifies)
    ("r1", "a/conf.json", "conf.json", "s1"),
    ("r2", "b/conf.json", "conf.json", "s2"),
    # filename-dup + content-dup (excluded: content not unique)
    ("r1", "a/LICENSE", "LICENSE", "s3"),
    ("r2", "b/LICENSE", "LICENSE", "s3"),
    # filename-unique (excluded)
    ("r1", "a/main.rs", "main.rs", "s4"),
]
FSCHEMA = "repo string, path string, filename string, sha256 string"


def test_groups_containing(spark):
    g = spark.createDataFrame(GROUPS, GSCHEMA)
    out = sorted(r["key"] for r in groups_containing(g, "a/x.py").collect())
    assert out == ["h1", "h3"]


def test_members_of_groups(spark):
    g = spark.createDataFrame(GROUPS, GSCHEMA)
    rows = {(r["key"], r["path"]) for r in members_of_groups(g).collect()}
    assert ("h1", "b/x.py") in rows and ("h2", "c/y.py") in rows
    assert len(rows) == 5


def test_dup_one_dim_unique_other(spark):
    f = spark.createDataFrame(FILES, FSCHEMA)
    out = sorted(r["path"] for r in
                 dup_in_one_dim_unique_in_other(f, "filename", "sha256").collect())
    assert out == ["a/conf.json", "b/conf.json"]
