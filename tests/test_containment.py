"""Substring-containment pass: planted contained pairs detected via the
suffix-index applyInPandas operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from uncp_spark.operators.containment import substring_containment


def _texts(spark, rows):
    return spark.createDataFrame(rows, "file_id long, norm_text string")


def test_planted_containment(spark):
    block = " ".join(f"tok{i}" for i in range(50))
    texts = _texts(
        spark,
        [
            (1, block),
            (2, block + " extra trailing code here"),
            (3, "completely different content with other words"),
            (4, "prefix stuff " + block + " suffix stuff"),
        ],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 4)], "src long, dst long"
    )
    out = {(r["src"], r["dst"]): r["substr_contained"]
           for r in substring_containment(pairs, texts).collect()}
    assert out[(1, 2)] is True      # block ⊂ block+extra
    assert out[(1, 3)] is False
    assert out[(1, 4)] is True      # block ⊂ wrapped
    assert out[(2, 4)] is False     # overlapping but not contained


def test_direction_shorter_probes_longer(spark):
    texts = _texts(spark, [(10, "abc def ghi jkl"), (20, "def ghi")])
    # dst is the SHORTER file here: operator must probe short→long anyway
    pairs = spark.createDataFrame([(10, 20)], "src long, dst long")
    row = substring_containment(pairs, texts).first()
    assert row["substr_contained"] is True


def test_suffix_index_amortization_used(spark):
    target = " ".join(f"w{i}" for i in range(200))
    rows = [(100, target)] + [(i, f"w{i} w{i+1} w{i+2}") for i in range(8)]
    texts = _texts(spark, rows)
    pairs = spark.createDataFrame([(i, 100) for i in range(8)], "src long, dst long")
    out = substring_containment(pairs, texts)
    assert out.filter(F.col("used_suffix_index")).count() == 8
    assert out.filter(F.col("substr_contained")).count() == 8
