"""U3/U4 — keyed dedup with keep-last / keep-first semantics, plus the
general exact-dedup operators a training-data pipeline needs.

Reference parity: uncp's scan table dedups by path keeping the *newest*
row after every scan (`unique(subset=[path], keep=Last)`,
src/data.rs:199-204) and merge-on-save keeps the *incoming* row
(keep=First with incoming stacked first, src/data.rs:401-410). Spark's
``dropDuplicates`` keeps an arbitrary row, so the correct idiom is a
row_number window over an explicit precedence ordering (SURVEY.md §4
"needs idiom").

Scale: one shuffle on the key; at 100 TB prefer a pre-bucketed layout on
the key so the window becomes a within-partition sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Keep, per key, the last row under ``order`` ascending (i.e. the row
    that sorts highest wins — pass e.g. [col('scan_id'), col('ts')])."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_keep_incoming(
    existing: DataFrame, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """uncp merge_with semantics (src/data.rs:401-410): union, incoming
    row wins on key collision. Precedence is explicit, not positional."""
    tagged = incoming.withColumn("_prec", F.lit(0)).unionByName(
        existing.withColumn("_prec", F.lit(1))
    )
    return dedup_keep_first(tagged, keys, [F.col("_prec")]).drop("_prec")


def exact_dedup(df: DataFrame, content_col: str = "content",
                tiebreak: Sequence[str] = ("path",)) -> DataFrame:
    """Exact content dedup for training pipelines: keep one deterministic
    representative per distinct content hash."""
    hashed = df.withColumn("_h", F.sha2(F.col(content_col), 256))
    w = Window.partitionBy("_h").orderBy(*[F.asc(c) for c in tiebreak])
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )
