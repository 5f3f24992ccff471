"""F16 — 64-bit frequency-weighted SimHash as a pandas UDF.

Fills the fuzzy-hash role of uncp's never-populated ``perceptual_hash``
/ ``text_hash`` columns (src/data.rs:171-176, Cargo.toml:48-49 declare
the deps, src/similarity.rs:1-7 is an empty trait). Hamming distance is
later evaluated fully JVM-side: bit_count(simhash_a ^ simhash_b).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uncp_spark.functions.kernels import simhash_batch


@F.pandas_udf(T.LongType())
def simhash_udf(token_hashes: pd.Series) -> pd.Series:
    arrays = [
        np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
        for s in token_hashes
    ]
    return pd.Series(simhash_batch(arrays))


def with_simhash(df: DataFrame, token_col: str = "token_hashes") -> DataFrame:
    return df.withColumn("simhash", simhash_udf(F.col(token_col)))
