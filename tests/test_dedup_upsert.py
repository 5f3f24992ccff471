"""Keep-last/keep-first dedup idioms (U3/U4), upsert (J1), invalidation (S8).

Mirrors the reference's semantics tests (src/data.rs:465-559:
add_files dedup-by-path keep-last; update_hashes upsert) in Spark form.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from uncp_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
    exact_dedup,
    merge_keep_incoming,
)
from uncp_spark.operators.upsert import invalidate_changed, pending_rows, upsert_columns

SCAN_SCHEMA = "path string, scan_id int, hash string"


def test_keep_last_newest_scan_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, "h1"), ("a", 2, "h2"), ("b", 1, "h3")], SCAN_SCHEMA
    )
    out = {r["path"]: r["hash"]
           for r in dedup_keep_last(df, ["path"], [F.col("scan_id")]).collect()}
    assert out == {"a": "h2", "b": "h3"}


def test_keep_first(spark):
    df = spark.createDataFrame(
        [("a", 1, "h1"), ("a", 2, "h2")], SCAN_SCHEMA
    )
    out = {r["path"]: r["hash"]
           for r in dedup_keep_first(df, ["path"], [F.col("scan_id")]).collect()}
    assert out == {"a": "h1"}


def test_merge_keep_incoming(spark):
    existing = spark.createDataFrame([("a", 1, "old"), ("b", 1, "keep")], SCAN_SCHEMA)
    incoming = spark.createDataFrame([("a", 2, "new"), ("c", 2, "add")], SCAN_SCHEMA)
    out = {r["path"]: r["hash"]
           for r in merge_keep_incoming(existing, incoming, ["path"]).collect()}
    assert out == {"a": "new", "b": "keep", "c": "add"}


def test_exact_dedup_deterministic_representative(spark):
    df = spark.createDataFrame(
        [("z/p1", "same"), ("a/p2", "same"), ("m/p3", "other")],
        "path string, content string",
    )
    out = sorted(r["path"] for r in exact_dedup(df).collect())
    assert out == ["a/p2", "m/p3"]  # lexicographically-first path wins


def test_upsert_columns(spark):
    state = spark.createDataFrame(
        [("a", None, False), ("b", "hb", True), ("c", None, False)],
        "path string, hash string, hashed boolean",
    )
    updates = spark.createDataFrame(
        [("a", "ha", True), ("c", "hc", True)], "path string, hash string, hashed boolean"
    )
    out = {r["path"]: (r["hash"], r["hashed"])
           for r in upsert_columns(state, updates, ["path"], ["hash", "hashed"]).collect()}
    assert out == {"a": ("ha", True), "b": ("hb", True), "c": ("hc", True)}


def test_invalidate_changed_and_pending(spark):
    cached = spark.createDataFrame(
        [("a", 10, True), ("b", 20, True), ("c", 30, True)],
        "path string, size long, hashed boolean",
    )
    # b changed size, c deleted
    current = spark.createDataFrame([("a", 10), ("b", 25)], "path string, size long")
    out = invalidate_changed(cached, current, keys=("path",), change_cols=("size",))
    rows = {r["path"]: r["hashed"] for r in out.collect()}
    assert rows == {"a": True, "b": False}
    assert [r["path"] for r in pending_rows(out).collect()] == ["b"]
