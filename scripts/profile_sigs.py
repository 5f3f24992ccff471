#!/usr/bin/env python
"""Isolate the signature stage: where does the time go at 8 vs 32 cores?

Variants:
  compute   UDF + noop sink (no parquet)
  slim      write WITHOUT shingles/token_hashes/norm_text
  full      write everything the bench writes today
  jvmslim   shingle exprs only (no UDF), noop sink — JVM ceiling
"""

from __future__ import annotations

import json
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
from uncp_spark.operators.shingle import with_shingles
from uncp_spark.operators.signatures import with_signatures
from uncp_spark.session import ensure_parallelism, get_spark, warm_python_workers

CFG = SimilarityConfig()


def main() -> None:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "8")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("BENCH_AMPLIFY", "40"))
    variant = os.environ.get("SIG_VARIANT", "compute")
    spark = get_spark(cores, app_name="profile_sigs")
    warm_python_workers(spark)

    repos = bench_corpus(spark, sf_dir, amplify, content_repeat=3)
    files = ingest(repos).persist()
    files.count()
    reps = ensure_parallelism(exact_representatives(files))

    out_dir = tempfile.mkdtemp(prefix="sigprof_")
    results = {}
    for run in range(2):
        t0 = time.monotonic()
        if variant == "fused":
            from uncp_spark.operators.shingle import with_token_hashes
            from uncp_spark.operators.signatures import with_signatures_fused

            s = with_signatures_fused(with_token_hashes(reps, CFG), CFG)
            s.select("file_id", "repo", "path", "lang", "size", "depth",
                     "minhash", "simhash", "shingles", "n_shingles") \
             .write.mode("overwrite").parquet(os.path.join(out_dir, "fused"))
        elif variant == "tokhash":
            from uncp_spark.operators.shingle import with_token_hashes

            df = with_token_hashes(reps, CFG).select(
                "file_id", F.size("token_hashes").alias("n_tok"))
            df.write.mode("overwrite").format("noop").save()
        elif variant == "jvmslim":
            df = with_shingles(reps, CFG).select(
                "file_id", "n_shingles",
                F.size("token_hashes").alias("n_tok"))
            df.write.mode("overwrite").format("noop").save()
        else:
            s = with_signatures(with_shingles(reps, CFG), CFG)
            if variant == "compute":
                s.select("file_id", "minhash", "simhash", "n_shingles") \
                 .write.mode("overwrite").format("noop").save()
            elif variant == "slim":
                s.select("file_id", "repo", "path", "lang", "size", "depth",
                         "minhash", "simhash", "n_shingles") \
                 .write.mode("overwrite").parquet(os.path.join(out_dir, "slim"))
            elif variant == "full":
                s.select("file_id", "repo", "path", "lang", "size", "depth",
                         "minhash", "simhash", "shingles", "n_shingles") \
                 .write.mode("overwrite").parquet(os.path.join(out_dir, "full"))
        results[f"run{run}"] = round(time.monotonic() - t0, 2)
    print(json.dumps({"cores": cores, "variant": variant, **results}))
    spark.stop()
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
