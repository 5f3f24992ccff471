"""Fused signature path (with_token_hashes → one pandas UDF) vs the
expression path (with_shingles → signatures UDF).

Shingle id VALUES legitimately differ (splitmix-rolled vs
xxhash64-of-slice); everything consumers rely on must agree:
  - n_shingles (count of distinct k-token windows) identical
  - char-gram fallback rows produce the IDENTICAL shingle set
  - simhash identical (same token_hashes, same kernel)
  - est-Jaccard from minhash tracks true shingle Jaccard both ways
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig
from uncp_spark.functions.kernels import (
    est_jaccard,
    shingle_ids_batch,
    shingle_weights,
)
from uncp_spark.operators.shingle import with_shingles, with_token_hashes
from uncp_spark.operators.signatures import with_signatures, with_signatures_fused

CFG = SimilarityConfig()


def _corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    rows = [
        (1, base),
        (2, base + " with a small appended tail of extra tokens"),
        (3, "completely different content about spark dataframes "
            "and shuffle partitioning strategies at scale " * 2),
        (4, "tiny"),                      # < k tokens → char fallback
        (5, "four tokens only here"),     # < k tokens → char fallback
        (6, base),                        # exact dup of 1
    ]
    return spark.createDataFrame(rows, "file_id long, content string")


def _both(spark):
    df = _corpus(spark)
    expr = with_signatures(with_shingles(df, CFG), CFG).select(
        "file_id", "shingles", "n_shingles", "minhash", "simhash"
    ).toPandas().set_index("file_id").sort_index()
    fused = with_signatures_fused(with_token_hashes(df, CFG), CFG).select(
        "file_id", "shingles", "n_shingles", "minhash", "simhash"
    ).toPandas().set_index("file_id").sort_index()
    return expr, fused


def test_counts_simhash_and_char_fallback_agree(spark):
    expr, fused = _both(spark)
    assert list(expr["n_shingles"]) == list(fused["n_shingles"])
    assert list(expr["simhash"]) == list(fused["simhash"])
    # char-fallback rows (< k tokens) use the same char-gram hashes →
    # identical shingle sets, not just identical counts
    for fid in (4, 5):
        assert sorted(expr.loc[fid, "shingles"]) == sorted(fused.loc[fid, "shingles"])


def test_est_jaccard_tracks_truth_both_paths(spark):
    expr, fused = _both(spark)
    for frame in (expr, fused):
        s1 = set(frame.loc[1, "shingles"])
        s2 = set(frame.loc[2, "shingles"])
        true_j = len(s1 & s2) / len(s1 | s2)
        est = est_jaccard(
            np.asarray(frame.loc[1, "minhash"]), np.asarray(frame.loc[2, "minhash"])
        )
        assert est == pytest.approx(true_j, abs=0.15)
        # exact dup → identical signature
        assert list(frame.loc[1, "minhash"]) == list(frame.loc[6, "minhash"])
        # unrelated docs → near-zero estimate
        assert est_jaccard(
            np.asarray(frame.loc[1, "minhash"]), np.asarray(frame.loc[3, "minhash"])
        ) < 0.1


def test_shingle_ids_batch_kernel():
    w = shingle_weights(5, 42)
    rng = np.random.RandomState(0)
    rows = [
        rng.randint(-(1 << 62), 1 << 62, size=n).astype(np.int64)
        for n in (0, 3, 5, 6, 40)
    ]
    out = shingle_ids_batch(rows, 5, w)
    assert [len(o) for o in out[:3]] == [0, 0, 1]
    assert len(out[3]) == 2
    assert len(out[4]) == len(np.unique(out[4])) <= 36
    # order-sensitivity: reversing a window changes its id
    a = shingle_ids_batch([rows[4]], 5, w)[0]
    b = shingle_ids_batch([rows[4][::-1].copy()], 5, w)[0]
    assert set(a.tolist()) != set(b.tolist())
    # concatenation flattening must not leak windows across row
    # boundaries: each row's ids equal the ids computed row-alone
    solo = [shingle_ids_batch([r], 5, w)[0] for r in rows]
    for got, want in zip(out, solo):
        assert got.tolist() == want.tolist()


def test_shingle_sets_recompute_bit_identical(spark, repos_df, cfg):
    """The residual-verify recompute path (signatures.shingle_sets) must
    reproduce the fused pass's shingle arrays exactly — same kernel,
    same token-hash prelude, pinned seed."""
    from uncp_spark.operators.exact import exact_representatives
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.operators.signatures import shingle_sets, signature_table

    files = ingest(repos_df)
    reps = exact_representatives(files)
    fat = signature_table(reps, cfg).select("file_id", "shingles")
    rec = shingle_sets(files, cfg, ids=reps.select("file_id")).withColumnRenamed(
        "shingles", "shingles2"
    )
    joined = fat.join(rec, "file_id")
    assert joined.count() == fat.count()
    assert joined.filter(F.col("shingles") != F.col("shingles2")).count() == 0


def test_skinny_signature_table_yields_identical_edges(spark, repos_df, cfg):
    """Production shape: signature table WITHOUT shingle arrays (they
    never cross Arrow), verify recomputing them for residual members —
    accepted edge set must equal the fat path's exactly."""
    from uncp_spark.operators.exact import exact_representatives
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.operators.lsh import candidate_pairs
    from uncp_spark.operators.signatures import signature_table
    from uncp_spark.operators.verify import accept_edges, score_pairs

    files = ingest(repos_df)
    reps = exact_representatives(files)
    fat = signature_table(reps, cfg)
    skinny = signature_table(reps, cfg, include_shingles=False)
    assert "shingles" not in skinny.columns

    pf, _ = candidate_pairs(fat, cfg)
    ps, _ = candidate_pairs(skinny, cfg)
    ef = accept_edges(score_pairs(pf, fat, cfg), cfg)
    es = accept_edges(score_pairs(ps, skinny, cfg, files=files), cfg)
    rows_f = {(r.src, r.dst, round(r.score, 6), r.edge_type) for r in ef.collect()}
    rows_s = {(r.src, r.dst, round(r.score, 6), r.edge_type) for r in es.collect()}
    assert rows_f == rows_s and rows_f


def test_score_pairs_without_shingles_or_files_raises(spark, repos_df, cfg):
    from uncp_spark.operators.exact import exact_representatives
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.operators.lsh import candidate_pairs
    from uncp_spark.operators.signatures import signature_table
    from uncp_spark.operators.verify import score_pairs

    files = ingest(repos_df)
    skinny = signature_table(exact_representatives(files), cfg,
                             include_shingles=False)
    pairs, _ = candidate_pairs(skinny, cfg)
    with pytest.raises(ValueError, match="shingles"):
        score_pairs(pairs, skinny, cfg)


def test_skinny_fused_udf_return_type_excludes_shingle_arrays():
    """The Arrow-payload contract itself: the production UDF's return
    struct must not carry the shingle arrays (a select after the UDF
    cannot remove them from the transfer)."""
    from uncp_spark.operators.signatures import make_fused_signatures_udf

    skinny = make_fused_signatures_udf(CFG, include_shingles=False).returnType
    assert [f.name for f in skinny.fields] == [
        "n_shingles", "minhash", "simhash", "bottomk"
    ]
    fat = make_fused_signatures_udf(CFG, include_shingles=True).returnType
    assert [f.name for f in fat.fields] == [
        "shingles", "n_shingles", "minhash", "simhash", "bottomk"
    ]
    # bottomk is admissible in the skinny payload because it is BOUNDED:
    # at most containment_sketch_size longs per row (a fixed-width sketch,
    # not the unbounded shingle array the contract exists to exclude)
    assert CFG.containment_sketch_size <= 1024
