#!/usr/bin/env python
"""One-off profiling of the candidate + verify path at bench scale.

Counts, per tier, what the bench's lsh_pairs/verify_edges stages
actually process, with wall times per sub-step — so optimization
targets are measured, not guessed. Not part of the test suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import bench_corpus
from uncp_spark.config import SimilarityConfig
from uncp_spark.operators.containment_index import (
    containment_candidates,
    containment_entries,
)
from uncp_spark.operators.exact import exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.lsh import candidate_pairs
from uncp_spark.operators.signatures import signature_table
from uncp_spark.session import ensure_parallelism, get_spark, warm_python_workers

CFG = SimilarityConfig()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    amplify = int(os.environ.get("BENCH_AMPLIFY", "8"))
    spark = get_spark(cpus, app_name="profile_verify")
    warm_python_workers(spark)

    t = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        t[name] = round(time.monotonic() - t0, 3)
        print(f"  {name}: {t[name]}s", flush=True)
        return out

    repos = bench_corpus(spark, sf_dir, amplify)
    files = ingest(repos).persist()
    print("n_files:", files.count(), flush=True)

    reps = ensure_parallelism(exact_representatives(files))
    sig_path = "/tmp/profile_sigs.parquet"
    def build():
        s = signature_table(reps, CFG, include_shingles=False).select(
            "file_id", "minhash", "simhash", "n_shingles", "bottomk")
        s.write.mode("overwrite").parquet(sig_path)
        return spark.read.parquet(sig_path)
    sigs = timed("signatures", build)
    print("n_reps:", sigs.count(), flush=True)

    # --- tier 1: LSH band pairs
    lsh, _hb = candidate_pairs(sigs, CFG)
    lsh = lsh.persist()
    timed("lsh_band_pairs", lsh.count)
    print("  n_lsh_pairs:", lsh.count(), flush=True)

    # --- tier 2: containment sketch pairs, sub-step timings
    ent = containment_entries(sigs).persist()
    timed("containment_entries", ent.count)
    print("  n_entries:", ent.count(), flush=True)
    sizes = ent.groupBy("shid").agg(F.count("*").alias("bucket_size")).persist()
    timed("bucket_sizes", sizes.count)
    dist = sizes.groupBy(
        F.when(F.col("bucket_size") == 1, "1")
        .when(F.col("bucket_size") <= 4, "2-4")
        .when(F.col("bucket_size") <= 16, "5-16")
        .when(F.col("bucket_size") <= 64, "17-64")
        .when(F.col("bucket_size") <= 1000, "65-1000")
        .otherwise(">1000 (hot)").alias("sz")
    ).agg(F.count("*").alias("buckets"), F.sum("bucket_size").alias("entries"))
    print(dist.toPandas().to_string(), flush=True)

    cont, _hs = containment_candidates(sigs, CFG)
    cont = cont.persist()
    timed("containment_pairs", cont.count)
    print("  n_containment_pairs:", cont.count(), flush=True)

    both = cont.join(lsh.select("src", "dst"), ["src", "dst"], "left_semi")
    print("  containment ∩ lsh:", both.count(), flush=True)

    # --- combined + phase 1
    pairs = (lsh.unionByName(cont).groupBy("src", "dst")
             .agg(F.max("from_hot_band").alias("from_hot_band"))).persist()
    timed("combined_pairs", pairs.count)
    n_pairs = pairs.count()
    print("  n_combined:", n_pairs, flush=True)

    mh = sigs.select("file_id", "minhash", "simhash")
    a = mh.select(F.col("file_id").alias("src"), F.col("minhash").alias("mh_a"),
                  F.col("simhash").alias("sh_a"))
    b = mh.select(F.col("file_id").alias("dst"), F.col("minhash").alias("mh_b"),
                  F.col("simhash").alias("sh_b"))
    eq = F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int"))
    est_j = F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.lit(CFG.num_perm)
    phase1 = (pairs.join(a, "src").join(b, "dst")
              .withColumn("est_jaccard", est_j)
              .withColumn("hamming",
                          F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
              .select("src", "dst", "from_hot_band", "est_jaccard", "hamming")
              ).persist()
    timed("phase1", phase1.count)
    acc1 = (F.col("est_jaccard") >= CFG.jaccard_threshold) | (
        F.col("hamming") <= CFG.hamming_threshold)
    n_acc = phase1.filter(acc1).count()
    n_res = phase1.filter(~acc1).count()
    print(f"  phase1 accepted: {n_acc}  residual: {n_res}", flush=True)

    # --- phase 1.5 screen
    from uncp_spark.operators.verify import score_pairs, release_scored_cache
    scored = score_pairs(pairs, sigs, CFG, files)
    timed("score_pairs_full", scored.count)
    n_screened = scored.filter(F.col("containment").isNull()
                               & (F.col("est_jaccard") < CFG.jaccard_threshold)
                               & (F.col("hamming") > CFG.hamming_threshold)).count()
    n_fat = scored.filter(F.col("containment").isNotNull()).count()
    print(f"  screened_out(+p1 losers w/ null cont): {n_screened}  "
          f"fat-path pairs: {n_fat}", flush=True)
    # member count for fat recompute
    surv = scored.filter(F.col("containment").isNotNull())
    need = (surv.select(F.col("src").alias("f"))
            .unionByName(surv.select(F.col("dst").alias("f"))).distinct().count())
    print("  fat-recompute members:", need, flush=True)
    release_scored_cache()
    print(t, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
