"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring the dedup pipeline's exact-vs-LSH split:

  cosine_topk       brute-force exact top-k — the baseline/oracle. Dot
                    products are pure column math (zip_with + aggregate,
                    JVM-side); the query side is broadcast so the big
                    corpus never shuffles.
  rp_lsh_buckets /  random-hyperplane (signed random projection) LSH:
  ann_topk          each vector gets a b-bit signature; same-bucket
                    vectors are candidates, re-ranked by exact cosine.
                    The scale path — bucket equi-join instead of the
                    quadratic cross join.

Embedding-cosine near-duplicate detection (training-data dedup over an
embedding column) is `ann_topk` with a similarity floor.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast queries × corpus)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity_col(F.col("_cv"), F.col("_qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def make_rp_signature_udf(dim: int, bits: int = 16, tables: int = 1, seed: int = 42):
    """Signed-random-projection signature UDF: ``tables`` independent
    groups of ``bits`` hyperplanes → one bucket key per table.
    Deterministic: the projection matrix derives from seed (built once,
    identical on every executor — same discipline as the MinHash perms)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, tables * bits)).astype(np.float32)
    weights = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def rp_sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = ((mat @ planes) > 0).reshape(len(mat), tables, bits)
        keys = (signs.astype(np.int64) * weights[None, None, :]).sum(axis=2)
        return pd.Series(list(keys))

    return rp_sig


def rp_lsh_buckets(
    df: DataFrame, dim: int, bits: int = 16, tables: int = 1, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per input row per table: (…, table, bucket)."""
    sig = make_rp_signature_udf(dim, bits, tables, seed)(F.col(vec_col))
    return df.select("*", F.posexplode(sig).alias("table", "bucket"))


def derive_rp_bits(n_rows: int, target_bucket: int = 128,
                   lo: int = 6, hi: int = 24) -> int:
    """Signature width scaling with corpus size: avg bucket population is
    n / 2^bits per table, so bits = ceil(log2(n / target)). A fixed
    bits=12 at 10^9 vectors means ~244k vectors/bucket/table — quadratic
    pair blowup; at 10^9 this returns 23. Clamped: below ``lo`` the angle
    resolution is useless, above ``hi`` buckets are so fine that recall
    needs more tables than anyone runs."""
    return max(lo, min(hi, math.ceil(math.log2(max(n_rows, 2) / target_bucket))))


# persist handle for the bucket-id frame of the most recent
# ann_candidate_ids call, retired at the next call (the verify-stage
# ScorerCache policy): a long-lived session never accumulates pinned
# blocks, while within one query the frame is computed once
_CAND_CACHE: list = []


def _retire_cand_cache() -> None:
    while _CAND_CACHE:
        df = _CAND_CACHE.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def _corpus_rows(corpus: DataFrame, n_rows: int | None) -> int:
    """Corpus size for bits derivation: the caller's hint when given
    (pipelines already know their file/vector counts — re-counting here
    would add a full count action inside the query, measured at ~0.5 s
    per call on the bench), else one count job (the scale-safe default
    for callers that know nothing)."""
    return n_rows if n_rows is not None else corpus.count()


def ann_candidate_ids(
    corpus: DataFrame, dim: int, bits: int, tables: int = 8,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_cap: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """→ (cand_ids(vec_id, nbr_id) deduped across tables, hot_report).

    Skew discipline mirrors the text tier's ``hot_band_cap``: bucket
    sizes are counted FIRST (map-side-combinable count), buckets over
    ``bucket_cap`` are excluded from the self-join AND reported with
    their (table, bucket, bucket_size) — a duplicate-heavy embedding
    corpus (10^6 copies of one vector ⇒ one bucket in every table) would
    otherwise go quadratic silently. Multi-table redundancy means a pair
    lost to one hot bucket usually survives via its other tables.

    The candidate frames carry ONLY ids: vectors are dropped before the
    bucket self-join and the cross-table dedup shuffle, and re-joined by
    the caller — at dim=768 float32 that keeps ~3 KB/row out of the two
    widest exchanges."""
    ids = rp_lsh_buckets(
        corpus.select(F.col(id_col), F.col(vec_col)), dim, bits, tables,
        seed, vec_col,
    ).select(F.col(id_col).alias("vec_id"), "table", "bucket")
    # the bucket-id frame is referenced by the size count, BOTH sides of
    # the bucket self-join, and (via hot_report) a possible second
    # action — without the pin the rp-signature pandas UDF re-evaluates
    # the whole corpus once per reference (~4x per ann query, the
    # dominant cost of the bench's ann_topk stage). Narrow frame
    # (id + two ints per row per table); retired at the next call.
    from pyspark.storagelevel import StorageLevel

    _retire_cand_cache()
    ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
    _CAND_CACHE.append(ids)
    sizes = ids.groupBy("table", "bucket").agg(
        F.count("*").alias("bucket_size")
    )
    ok = sizes.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= bucket_cap)
    ).select("table", "bucket")
    hot_report = sizes.filter(F.col("bucket_size") > bucket_cap)
    inb = ids.join(ok, ["table", "bucket"], "left_semi")
    other = inb.select(F.col("vec_id").alias("nbr_id"), "table", "bucket")
    cand_ids = (
        inb.join(other, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id")
        .dropDuplicates(["vec_id", "nbr_id"])  # union across tables
    )
    return cand_ids, hot_report


def ann_topk(
    corpus: DataFrame, k: int, dim: int, bits: int | None = None,
    tables: int = 8, seed: int = 42, id_col: str = "vec_id",
    vec_col: str = "embedding", min_cosine: float | None = None,
    bucket_cap: int = 4096, return_report: bool = False,
    n_rows: int | None = None,
):
    """Approximate all-pairs top-k via multi-table RP-LSH: candidates are
    the union of same-(table, bucket) pairs over ``tables`` independent
    hash tables (equi-join on the bucket key — the 100 TB-safe plan,
    collision prob 1-(1-(1-θ/π)^bits)^tables), then exact cosine re-rank.

    ``bits=None`` — the DEFAULT — derives the signature width from the
    corpus size (one count job) via :func:`derive_rp_bits`; a fixed
    width is opt-in, because every fixed choice goes quadratic at some
    corpus size (12 bits ⇒ ~244k vectors/bucket/table at 10^9 rows) and
    scale-safety should not require the caller to know that. Buckets
    over ``bucket_cap`` are skipped and reported (pass
    ``return_report=True`` for ``(topk, hot_report)``). Norms are
    computed once per row, not once per candidate pair."""
    if bits is None:
        bits = derive_rp_bits(_corpus_rows(corpus, n_rows))
    cand_ids, hot_report = ann_candidate_ids(
        corpus, dim, bits, tables, seed, id_col, vec_col, bucket_cap
    )
    # NOTE (r6, measured): scoring each unordered pair once and
    # mirroring (halving the vector joins + dot products) was tried and
    # REVERTED — the half-frame persist that reuse requires breaks
    # pipelining into the top-k window exchange and measured ~0.9 s
    # SLOWER per query at the bench corpus (plain 1.7-1.9 s vs mirrored
    # 2.7-2.9 s over 4 interleaved iterations); the interpreted dot
    # products are not the bottleneck at candidate volumes the bucket
    # cap allows.
    cand = _exact_cosine(corpus, cand_ids, id_col, vec_col)
    if min_cosine is not None:
        cand = cand.filter(F.col("cosine") >= min_cosine)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return (topk, hot_report) if return_report else topk


def _exact_cosine(corpus: DataFrame, cand_ids: DataFrame,
                  id_col: str, vec_col: str) -> DataFrame:
    """Re-rank candidates by exact cosine: vectors re-joined by id (the
    candidate exchanges stayed id-only), norms computed once per row."""
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    return (
        cand_ids
        .join(vecs, "vec_id")
        .join(
            vecs.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("_v").alias("_nv"),
                F.col("_n").alias("_nn"),
            ),
            "nbr_id",
        )
        .select(
            "vec_id", "nbr_id",
            F.round(
                _dot(F.col("_v"), F.col("_nv")) / (F.col("_n") * F.col("_nn")),
                6,
            ).alias("cosine"),
        )
    )


def embedding_near_dup_pairs(
    corpus: DataFrame, dim: int, threshold: float = 0.95,
    bits: int | None = None, tables: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_cap: int = 4096, return_report: bool = False,
    n_rows: int | None = None,
):
    """Embedding-cosine near-dup edges (id_a < id_b, cosine ≥ threshold)
    — candidates from multi-table RP-LSH buckets, never the cross join.
    At cos ≥ 0.95 the per-table collision prob is ≈ 0.9^bits, so 8
    tables of 12 bits give ≥ 0.97 recall.

    THRESHOLD mode, not top-k: every candidate pair at ≥ threshold is
    an edge — no rank window, no neighbor cap. The previous form reused
    ``ann_topk(k=1000)``, so a vector with more than 1000 true
    ≥-threshold neighbors (duplicate-heavy corpora are exactly where
    this runs) silently dropped edges; now the only pruning is the
    hot-BUCKET cap, which is counted and reported, never silent
    (``return_report=True`` → ``(edges, hot_report)``)."""
    if bits is None:
        bits = derive_rp_bits(_corpus_rows(corpus, n_rows))
    cand_ids, hot_report = ann_candidate_ids(
        corpus, dim, bits, tables, seed, id_col, vec_col, bucket_cap
    )
    # each unordered pair scores once: orient before the vector join
    cand_ids = cand_ids.filter(F.col("vec_id") < F.col("nbr_id"))
    edges = (
        _exact_cosine(corpus, cand_ids, id_col, vec_col)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("vec_id").alias("id_a"),
            F.col("nbr_id").alias("id_b"),
            "cosine",
        )
    )
    return (edges, hot_report) if return_report else edges
