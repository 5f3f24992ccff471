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


_FUSED_TYPE = T.StructType(
    [
        T.StructField("shingles", T.ArrayType(T.LongType()), False),
        T.StructField("n_shingles", T.IntegerType(), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def make_fused_signatures_udf(cfg: SimilarityConfig):
    """shingle-windowing + MinHash + SimHash in ONE numpy pass.

    Input: ``token_hashes`` (per-token xxhash64, with repetition) and
    ``char_hashes`` (char-gram hashes, non-null only for rows shorter
    than ``shingle_k`` tokens). The k-token shingle ids come from the
    vectorized rolling positional hash (kernels.shingle_ids_batch) —
    the JVM never materializes window slices, which was the measured
    scaling bottleneck of the expression-based shingle stage. Shingle
    id VALUES differ from the expression path (splitmix-rolled vs
    xxhash64-of-slice); all consumers use them as opaque set keys."""
    from uncp_spark.functions.kernels import shingle_ids_batch, shingle_weights

    a, b = minhash_params(cfg)
    prime = cfg.prime
    num_perm = cfg.num_perm
    use_oph = cfg.minhash_impl == "oph"
    k = cfg.shingle_k
    weights = shingle_weights(k, cfg.seed)

    @F.pandas_udf(_FUSED_TYPE)
    def fused_udf(token_hashes: pd.Series, char_hashes: pd.Series) -> pd.DataFrame:
        th = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in token_hashes
        ]
        sh = shingle_ids_batch(th, k, weights)
        for i, ch in enumerate(char_hashes):
            if ch is not None:
                sh[i] = np.unique(np.asarray(ch, dtype=np.int64))
        if use_oph:
            mh = oph_minhash_batch(sh, a, b, prime, num_perm)
        else:
            mh = minhash_batch(sh, a, b, prime)
        sim = simhash_batch(th)
        return pd.DataFrame(
            {
                "shingles": list(sh),
                "n_shingles": [len(s) for s in sh],
                "minhash": list(mh),
                "simhash": sim,
            }
        )

    return fused_udf


def with_signatures_fused(df: DataFrame, cfg: SimilarityConfig) -> DataFrame:
    """Adds ``shingles``/``n_shingles``/``minhash``/``simhash`` from the
    ``with_token_hashes`` prelude in one fused pandas-UDF pass."""
    sig = make_fused_signatures_udf(cfg)(F.col("token_hashes"), F.col("char_hashes"))
    return (
        df.withColumn("_sig", sig)
        .withColumn("shingles", F.col("_sig.shingles"))
        .withColumn("n_shingles", F.col("_sig.n_shingles"))
        .withColumn("minhash", F.col("_sig.minhash"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .drop("_sig")
    )


def signature_table(reps: DataFrame, cfg: SimilarityConfig) -> DataFrame:
    """The signature stage, impl selected by ``cfg.shingle_impl`` — the
    one entry point pipeline/bench/queries share."""
    from uncp_spark.operators.shingle import with_shingles, with_token_hashes

    if cfg.shingle_impl == "fused":
        return with_signatures_fused(with_token_hashes(reps, cfg), cfg)
    if cfg.shingle_impl == "expr":
        return with_signatures(with_shingles(reps, cfg), cfg)
    raise ValueError(f"unknown shingle_impl: {cfg.shingle_impl!r}")
