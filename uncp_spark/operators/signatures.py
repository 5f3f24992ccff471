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
        T.StructField("bottomk", T.ArrayType(T.LongType()), False),
    ]
)


_FUSED_TYPE_SKINNY = T.StructType(
    [
        T.StructField("n_shingles", T.IntegerType(), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("bottomk", T.ArrayType(T.LongType()), False),
    ]
)


def make_fused_signatures_udf(cfg: SimilarityConfig, include_shingles: bool = True):
    """shingle-windowing + MinHash + SimHash in ONE numpy pass.

    Input: ``token_hashes`` (per-token xxhash64, with repetition) and
    ``char_hashes`` (char-gram hashes, non-null only for rows shorter
    than ``shingle_k`` tokens). The k-token shingle ids come from the
    vectorized rolling positional hash (kernels.shingle_ids_batch) —
    the JVM never materializes window slices, which was the measured
    scaling bottleneck of the expression-based shingle stage. Shingle
    id VALUES differ from the expression path (splitmix-rolled vs
    xxhash64-of-slice); all consumers use them as opaque set keys.

    ``include_shingles=False`` drops the shingle arrays from the RETURN
    STRUCT — a select after the UDF cannot do this (the whole struct
    crosses Arrow regardless of downstream pruning), and the arrays are
    the dominant transfer payload (~8 B/token/row vs 1 KB fixed). The
    production pipeline runs skinny and recomputes shingles for the
    residual verify set only (shingle_sets below)."""
    from uncp_spark.functions.kernels import shingle_ids_batch, shingle_weights

    a, b = minhash_params(cfg)
    prime = cfg.prime
    num_perm = cfg.num_perm
    use_oph = cfg.minhash_impl == "oph"
    k = cfg.shingle_k
    m = cfg.containment_sketch_size
    weights = shingle_weights(k, cfg.seed)

    out_type = _FUSED_TYPE if include_shingles else _FUSED_TYPE_SKINNY

    @F.pandas_udf(out_type)
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
        cols = {
            "n_shingles": [len(s) for s in sh],
            "minhash": list(mh),
            "simhash": sim,
            # shingle ids are already sorted unique int64 (np.unique),
            # so the bottom-m containment sketch is a zero-cost slice
            "bottomk": [s[:m] for s in sh],
        }
        if include_shingles:
            cols = {"shingles": list(sh), **cols}
        return pd.DataFrame(cols)

    return fused_udf


def with_signatures_fused(df: DataFrame, cfg: SimilarityConfig,
                          include_shingles: bool = True) -> DataFrame:
    """Adds [``shingles``/]``n_shingles``/``minhash``/``simhash`` from
    the ``with_token_hashes`` prelude in one fused pandas-UDF pass."""
    sig = make_fused_signatures_udf(cfg, include_shingles)(
        F.col("token_hashes"), F.col("char_hashes")
    )
    out = df.withColumn("_sig", sig)
    if include_shingles:
        out = out.withColumn("shingles", F.col("_sig.shingles"))
    return (
        out.withColumn("n_shingles", F.col("_sig.n_shingles"))
        .withColumn("minhash", F.col("_sig.minhash"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .withColumn("bottomk", F.col("_sig.bottomk"))
        .drop("_sig")
    )


def make_shingles_udf(cfg: SimilarityConfig):
    """Shingle-set-only pandas UDF — same kernel, same ids, bit-identical
    to the ``shingles`` column of the fused pass (deterministic rolling
    positional hash + char-gram fallback)."""
    from uncp_spark.functions.kernels import shingle_ids_batch, shingle_weights

    k = cfg.shingle_k
    weights = shingle_weights(k, cfg.seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(token_hashes: pd.Series, char_hashes: pd.Series) -> pd.Series:
        th = [
            np.asarray(s, dtype=np.int64) if s is not None else np.empty(0, np.int64)
            for s in token_hashes
        ]
        sh = shingle_ids_batch(th, k, weights)
        for i, ch in enumerate(char_hashes):
            if ch is not None:
                sh[i] = np.unique(np.asarray(ch, dtype=np.int64))
        return pd.Series(list(sh))

    return shingles_udf


def shingle_sets(files: DataFrame, cfg: SimilarityConfig,
                 ids: DataFrame | None = None) -> DataFrame:
    """(file_id, shingles) recomputed from content — the RESIDUAL path.

    The signature stage does not ship its shingle arrays downstream:
    they are the dominant Arrow-transfer + checkpoint-write payload
    (~8 B/token/row — same order as the content itself), and only the
    small residual-candidate population ever needs them (exact
    containment / exact Jaccard in verify phase 2). Recomputing for
    exactly that population — ``ids`` semi-join, then the same
    deterministic kernel — trades a tiny bounded UDF pass for removing
    the fat column from the signature stage's shuffle/write entirely;
    at 10^12 files that column is petabytes that never existed.

    Ids are bit-identical to what the fused pass produced (same
    token-hash prelude, same kernel, pinned seed), so exact-Jaccard /
    containment values are unchanged. ``cfg.shingle_impl`` selects the
    matching implementation ("expr" recomputes via the expression
    path's xxhash64-of-slice ids)."""
    src = files.select("file_id", "content")
    if ids is not None:
        src = src.join(ids.select("file_id"), "file_id", "left_semi")
    from uncp_spark.operators.shingle import with_shingles, with_token_hashes

    if cfg.shingle_impl == "expr":
        return with_shingles(src, cfg).select("file_id", "shingles")
    pre = with_token_hashes(src, cfg)
    return pre.select(
        "file_id",
        make_shingles_udf(cfg)(
            F.col("token_hashes"), F.col("char_hashes")
        ).alias("shingles"),
    )


def signature_table(reps: DataFrame, cfg: SimilarityConfig,
                    include_shingles: bool = True) -> DataFrame:
    """The signature stage, impl selected by ``cfg.shingle_impl`` — the
    one entry point pipeline/bench/queries share.

    ``include_shingles=False`` is the production shape: fixed-width
    output only (see make_fused_signatures_udf); the expression impl
    simply drops the column (it never crosses Arrow there)."""
    from uncp_spark.operators.shingle import with_shingles, with_token_hashes

    if cfg.shingle_impl == "fused":
        return with_signatures_fused(
            with_token_hashes(reps, cfg), cfg, include_shingles
        )
    if cfg.shingle_impl == "expr":
        out = with_signatures(with_shingles(reps, cfg), cfg).withColumn(
            # same bottom-m-by-ascending-int64 sketch as the fused path
            # (ids differ between impls; the order rule is identical)
            "bottomk",
            F.slice(F.array_sort("shingles"), 1, cfg.containment_sketch_size),
        )
        return out if include_shingles else out.drop("shingles")
    raise ValueError(f"unknown shingle_impl: {cfg.shingle_impl!r}")
