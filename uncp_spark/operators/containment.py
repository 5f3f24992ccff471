"""F17/S5b — exact substring containment pass over candidate pairs.

The north_rule's third tier: verbatim-inclusion detection ("file A = a
block of file B plus extra code" — uncp's designed content-aware tier,
DESIGN.md:231-258, never implemented in the reference). Runs only on
LSH/exact candidate pairs, never all-pairs.

Execution shape: candidate pairs join their normalized texts, then
``applyInPandas`` grouped by the *containing* side so one suffix array
per target amortizes across all probes against it (functions/suffix.py;
one build O(n log² n), each probe O(m log n)). Groups with a single
probe skip the index and use the C two-way search (str.find) — same
answer, cheaper constant. Python here is Arrow-batched and per-group,
not per-row (input_hint constraint).

Memory guard (SURVEY.md §7.3 hard part #3): texts above ``max_text_len``
fall back to direct find (no index) so a pathological giant file cannot
OOM an executor building its array; the fallback is counted in the
output for observability — no silent caps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_INDEX_TEXT_LEN = 1 << 20  # 1 MiB of normalized text
MIN_PROBES_FOR_INDEX = 4


def _check_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from uncp_spark.functions.suffix import SuffixIndex

    target = pdf["target_text"].iloc[0]
    probes = pdf["probe_text"]
    use_index = (
        len(pdf) >= MIN_PROBES_FOR_INDEX and len(target) <= MAX_INDEX_TEXT_LEN
    )
    if use_index:
        idx = SuffixIndex(target)
        contained = [idx.contains(p) for p in probes]
    else:
        contained = [p in target for p in probes]
    return pd.DataFrame(
        {
            "src": pdf["src"],
            "dst": pdf["dst"],
            "substr_contained": contained,
            "used_suffix_index": use_index,
        }
    )


def substring_containment(
    pairs: DataFrame, texts: DataFrame, id_col: str = "file_id",
    text_col: str = "norm_text",
) -> DataFrame:
    """pairs(src, dst) × texts(file_id, norm_text) →
    (src, dst, substr_contained, used_suffix_index).

    The shorter text is always the probe; grouping key is the longer
    (containing) side's id.
    """
    a = texts.select(F.col(id_col).alias("src"), F.col(text_col).alias("text_a"))
    b = texts.select(F.col(id_col).alias("dst"), F.col(text_col).alias("text_b"))
    joined = (
        pairs.select("src", "dst")
        .join(a, "src")
        .join(b, "dst")
        .select(
            "src",
            "dst",
            F.when(F.length("text_a") <= F.length("text_b"), F.col("dst"))
            .otherwise(F.col("src"))
            .alias("target_id"),
            F.when(F.length("text_a") <= F.length("text_b"), F.col("text_b"))
            .otherwise(F.col("text_a"))
            .alias("target_text"),
            F.when(F.length("text_a") <= F.length("text_b"), F.col("text_a"))
            .otherwise(F.col("text_b"))
            .alias("probe_text"),
        )
    )
    # id type follows the caller's (file_id is a 128-bit hex string in
    # the pipeline; tests use longs) — the schema must not pin it
    id_t = dict(pairs.dtypes)["src"]
    return joined.groupBy("target_id").applyInPandas(
        _check_group,
        schema=f"src {id_t}, dst {id_t}, "
               "substr_contained boolean, used_suffix_index boolean",
    )
