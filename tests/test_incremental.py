"""Incremental re-scan semantics (T5/S8): only the delta is processed."""

from __future__ import annotations

import pyspark.sql.functions as F

from uncp_spark.streaming.incremental import apply_increment, diff_snapshot

SCHEMA = "repo string, path string, sha256 string, result string"
CUR_SCHEMA = "repo string, path string, sha256 string"


def test_diff_snapshot(spark):
    cached = spark.createDataFrame(
        [("r", "a", "h1", "done"), ("r", "b", "h2", "done"), ("r", "c", "h3", "done")],
        SCHEMA,
    )
    current = spark.createDataFrame(
        [("r", "a", "h1"), ("r", "b", "h2x"), ("r", "d", "h4")], CUR_SCHEMA
    )
    parts = diff_snapshot(cached, current)
    assert [r["path"] for r in parts["unchanged"].collect()] == ["a"]
    assert [r["path"] for r in parts["changed"].collect()] == ["b"]
    assert [r["path"] for r in parts["added"].collect()] == ["d"]
    assert [r["path"] for r in parts["deleted"].collect()] == ["c"]


def test_apply_increment_processes_only_delta(spark):
    cached = spark.createDataFrame(
        [("r", "a", "h1", "old-result"), ("r", "b", "h2", "old-result")], SCHEMA
    )
    current = spark.createDataFrame(
        [("r", "a", "h1"), ("r", "b", "h2x"), ("r", "c", "h5")], CUR_SCHEMA
    )
    processed_paths = []

    def process(df):
        rows = df.collect()
        processed_paths.extend(sorted(r["path"] for r in rows))
        return df.withColumn("result", F.lit("fresh"))

    out = {r["path"]: r["result"]
           for r in apply_increment(cached, current, process).collect()}
    assert processed_paths == ["b", "c"]          # only the delta
    assert out == {"a": "old-result", "b": "fresh", "c": "fresh"}
