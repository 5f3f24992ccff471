"""Text-analysis function library on the driver-provided documents table."""

from __future__ import annotations

import pyspark.sql.functions as F

from uncp_spark.functions.text import (
    fingerprint64,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    word_token_count,
)

SF = "/root/testdata/sf0.001"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text string"
    )
    out = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert out == [3, 0, 0, 1]


def test_word_token_count_counts_punct(spark):
    df = spark.createDataFrame([("foo(bar, baz)!",)], "text string")
    # foo ( bar , baz ) ! → 7
    assert df.select(word_token_count(F.col("text"))).first()[0] == 7


def test_quality_score_bounds_and_ordering(spark):
    good = "The quick brown fox jumps over the lazy dog near the river bank today"
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& 1234 5678"
    df = spark.createDataFrame([(good,), (junk,)], "text string")
    scores = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund ist nicht hier und die katze",),
            ("le chat et la maison est grande les arbres",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert out == ["en", "de", "fr", "unknown"]


def test_stopword_ratio(spark):
    df = spark.createDataFrame([("the the the cat",)], "text string")
    assert abs(df.select(stopword_ratio(F.col("text"))).first()[0] - 0.75) < 1e-9


def test_fingerprint_normalized_equality(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("other",)], "text string"
    )
    fps = [r[0] for r in df.select(fingerprint64(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_functions_run_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_guess"),
        fingerprint64(F.col("text")).alias("fp"),
    )
    assert out.count() == docs.count()
    assert out.filter(F.col("n_tokens") <= 0).count() == 0
