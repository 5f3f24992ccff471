#!/usr/bin/env python
"""Where does the signature stage's time go at amplify=40, and which
sub-step fails to scale 4->16? One-off diagnostic, not part of the suite."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import bench_corpus
from uncp_spark.config import SimilarityConfig
from uncp_spark.operators.exact import exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.shingle import with_token_hashes
from uncp_spark.operators.signatures import make_fused_signatures_udf
from uncp_spark.session import ensure_parallelism, get_spark, warm_python_workers

CFG = SimilarityConfig()


def main() -> None:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "16")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("BENCH_AMPLIFY", "40"))
    spark = get_spark(cores, app_name="profile_sig_flat")
    warm_python_workers(spark)
    repos = bench_corpus(spark, sf_dir, amplify, content_repeat=3)
    files = ingest(repos).persist()
    print("files:", files.count(), "cores:", cores, flush=True)

    t = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {t[name]}s", flush=True)

    out = tempfile.mkdtemp(prefix="sigflat_")

    # warm pass twice, report both
    for p in range(2):
        # (a) rep election alone (agg + semi-join back, content moves)
        reps = ensure_parallelism(exact_representatives(files))
        timed(f"p{p}_reps_count", lambda: reps.select("file_id").count())

        # (b) tokenize only (JVM expressions): force materialization of
        # token_hashes sizes without Python
        pre = with_token_hashes(reps, CFG)
        timed(f"p{p}_tokenize_jvm", lambda: pre.select(
            F.sum(F.size("token_hashes"))).collect())

        # (c) tokenize + fused UDF compute, no write (checksum sink)
        udf = make_fused_signatures_udf(CFG, include_shingles=False)
        sigf = pre.withColumn("_sig", udf(F.col("token_hashes"),
                                          F.col("char_hashes")))
        timed(f"p{p}_udf_compute", lambda: sigf.select(
            F.sum(F.element_at("_sig.minhash", 1))).collect())

        # (d) full stage incl parquet write WITH bottomk
        def write_full():
            s = sigf.select(
                "file_id", "repo", "path", "lang", "size", "depth",
                F.col("_sig.minhash").alias("minhash"),
                F.col("_sig.simhash").alias("simhash"),
                F.col("_sig.n_shingles").alias("n_shingles"),
                F.col("_sig.bottomk").alias("bottomk"),
            )
            s.write.mode("overwrite").parquet(os.path.join(out, "full"))
        timed(f"p{p}_write_full", write_full)

        # (e) same write WITHOUT bottomk
        def write_nobk():
            s = sigf.select(
                "file_id", "repo", "path", "lang", "size", "depth",
                F.col("_sig.minhash").alias("minhash"),
                F.col("_sig.simhash").alias("simhash"),
                F.col("_sig.n_shingles").alias("n_shingles"),
            )
            s.write.mode("overwrite").parquet(os.path.join(out, "nobk"))
        timed(f"p{p}_write_nobk", write_nobk)

    print(t, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
