"""Combined signature stage: MinHash + SimHash in ONE pandas UDF pass.

with_minhash / with_simhash (separate UDFs) each ship the shingle/token
arrays driver→python through Arrow; fusing them halves the Arrow
transfer and the python-worker passes — the signature stage is the
pipeline's hot spot (it touches every distinct content once).

Same kernels, same pinned config, bit-identical output to the separate
operators (tested in tests/test_shingle_sigs.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uncp_spark.config import SimilarityConfig
from uncp_spark.functions.kernels import (
    minhash_batch,
    minhash_params,
    oph_minhash_batch,
    simhash_batch,
)

_SIG_TYPE = T.StructType(
    [
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def make_signatures_udf(cfg: SimilarityConfig):
    a, b = minhash_params(cfg)
    prime = cfg.prime
    num_perm = cfg.num_perm
    use_oph = cfg.minhash_impl == "oph"

    @F.pandas_udf(_SIG_TYPE)
    def signatures_udf(shingles: pd.Series, token_hashes: pd.Series) -> pd.DataFrame:
        sh = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in shingles
        ]
        th = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in token_hashes
        ]
        if use_oph:
            mh = oph_minhash_batch(sh, a, b, prime, num_perm)
        else:
            mh = minhash_batch(sh, a, b, prime)
        sim = simhash_batch(th)
        return pd.DataFrame({"minhash": list(mh), "simhash": sim})

    return signatures_udf


def with_signatures(df: DataFrame, cfg: SimilarityConfig) -> DataFrame:
    """Adds ``minhash`` + ``simhash`` from ``shingles``/``token_hashes``."""
    sig = make_signatures_udf(cfg)(F.col("shingles"), F.col("token_hashes"))
    return (
        df.withColumn("_sig", sig)
        .withColumn("minhash", F.col("_sig.minhash"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .drop("_sig")
    )
