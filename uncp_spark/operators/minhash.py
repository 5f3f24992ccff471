"""F15 — MinHash signatures as an Arrow-batched pandas UDF.

The permutation matrix is built once from the pinned seed
(kernels.minhash_params) and closed over by the UDF — identical on every
executor, so signatures are deterministic across batches, partitions and
runs (SURVEY.md §7.3 hard part #1). Arrow batch size is bounded in
session.py so the (num_perm × total_shingles) work matrix stays cache-
resident; the kernel additionally chunks permutations.

This is the designated slow path (per-row Python is banned by the
input_hint); everything before (shingling) and after (banding, joins)
is JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uncp_spark.config import SimilarityConfig
from uncp_spark.functions.kernels import minhash_batch, minhash_params, oph_minhash_batch


def make_minhash_udf(cfg: SimilarityConfig):
    a, b = minhash_params(cfg)
    prime = cfg.prime
    num_perm = cfg.num_perm
    use_oph = cfg.minhash_impl == "oph"

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(shingles: pd.Series) -> pd.Series:
        arrays = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in shingles
        ]
        if use_oph:
            sigs = oph_minhash_batch(arrays, a, b, prime, num_perm)
        else:
            sigs = minhash_batch(arrays, a, b, prime)
        return pd.Series(list(sigs))

    return minhash_udf


def with_minhash(df: DataFrame, cfg: SimilarityConfig,
                 shingle_col: str = "shingles") -> DataFrame:
    """Add ``minhash`` ArrayType(LongType) of length cfg.num_perm."""
    return df.withColumn("minhash", make_minhash_udf(cfg)(F.col(shingle_col)))
