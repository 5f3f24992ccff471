#!/usr/bin/env python
"""Instrumentation harness for the optimization rounds (guide §1).

NOT the official bench (bench.py is frozen for measurement): this file
isolates each pipeline stage with the noop sink, labels jobs
(setJobDescription), captures ``.explain("formatted")`` plans into a
plans directory, and breaks the composite stages (ann_topk,
connected_components) into sub-phases so optimization work targets the
real cost inside a stage, not the stage total.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py \
      [--plans-dir plans/r06] [--suffix before] [--passes 2]

Prints one JSON line with per-stage and per-sub-phase seconds of the
LAST (warm) pass.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import bench_corpus
from uncp_spark.config import SimilarityConfig
from uncp_spark.operators.components import connected_components, label_all
from uncp_spark.operators.containment_index import combined_candidate_pairs
from uncp_spark.operators.exact import (
    exact_cluster_edges,
    exact_clusters,
    exact_representatives,
)
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.priority import cluster_stats, priority_ranked
from uncp_spark.operators.signatures import signature_table
from uncp_spark.operators.verify import accept_edges, release_scored_cache, score_pairs
from uncp_spark.session import ensure_parallelism, get_spark, warm_python_workers

CFG = SimilarityConfig()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None,
                    help="write <stage>_<suffix>.txt explain output here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    amplify = int(os.environ.get("BENCH_AMPLIFY", "8"))

    spark = get_spark(cpus, app_name="uncp_spark_bench_extra")
    warm_python_workers(spark)
    sc = spark.sparkContext

    plans_dir = args.plans_dir
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    def save_plan(name, df):
        if not plans_dir:
            return
        path = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))

    timings: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        return out

    repos = bench_corpus(spark, sf_dir, amplify)
    ckpt_dir = tempfile.mkdtemp(prefix="uncp_benchx_")
    sig_path = os.path.join(ckpt_dir, "sigs.parquet")

    last_plan_pass = args.passes - 1
    for pass_i in range(args.passes):
        timings = {}
        capture = (pass_i == last_plan_pass)

        files = ingest(repos).persist()
        timed("ingest", lambda: files.count())
        if capture:
            save_plan("ingest", ingest(repos))

        ec = exact_clusters(files).persist()
        timed("exact_tier", lambda: ec.count())
        if capture:
            save_plan("exact_tier", exact_clusters(files))

        def build_sigs():
            reps = ensure_parallelism(exact_representatives(files))
            s = signature_table(reps, CFG, include_shingles=False).select(
                "file_id", "repo", "path", "lang", "size", "depth",
                "minhash", "simhash", "n_shingles", "bottomk",
            )
            if capture:
                save_plan("signatures", s)
            s.write.mode("overwrite").parquet(sig_path)
            out = spark.read.parquet(sig_path)
            out.count()
            return out

        sigs = timed("signatures", build_sigs)

        # --- lsh_pairs, split into band tier vs containment tier ---
        from uncp_spark.operators.lsh import candidate_pairs as band_pairs
        from uncp_spark.operators.containment_index import (
            containment_candidates,
        )

        bp, _ = band_pairs(sigs, CFG)
        timed("lsh_pairs.band_tier", lambda: noop(bp))
        cp, _ = containment_candidates(sigs, CFG)
        timed("lsh_pairs.containment_tier", lambda: noop(cp))

        def build_pairs():
            p, _hb, _hs = combined_candidate_pairs(sigs, CFG)
            if capture:
                save_plan("lsh_pairs", p)
            p = p.persist()
            p.count()
            return p

        pairs = timed("lsh_pairs", build_pairs)

        # verify sub-phases (instrumentation-only re-statement of
        # score_pairs' phase 1 — kept in sync by eye; the production
        # path stays the single source of truth)
        mh = sigs.select("file_id", "minhash", "simhash")
        p1 = (
            pairs.join(mh.select(F.col("file_id").alias("src"),
                                 F.col("minhash").alias("mh_a"),
                                 F.col("simhash").alias("sh_a")), "src")
            .join(mh.select(F.col("file_id").alias("dst"),
                            F.col("minhash").alias("mh_b"),
                            F.col("simhash").alias("sh_b")), "dst")
            .withColumn(
                "est_jaccard",
                F.aggregate(
                    F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0), lambda acc, v: acc + v) / F.lit(CFG.num_perm))
            .withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .select("src", "dst", "est_jaccard", "hamming")
        )
        timed("verify.phase1", lambda: noop(p1))

        def build_edges():
            e = accept_edges(score_pairs(pairs, sigs, CFG, files), CFG).select(
                "src", "dst")
            e = e.unionByName(exact_cluster_edges(files).select("src", "dst"))
            if capture:
                save_plan("verify_edges", e)
            e = e.persist()
            e.count()
            release_scored_cache()
            return e

        edges = timed("verify_edges", build_edges)

        if capture:
            # pair-population census: how many candidates phase 1
            # accepted outright, how many paid the fat shingle path,
            # how many the sketch screen certified away
            sc0 = score_pairs(pairs, sigs, CFG, files)
            census = {
                f"p1win={r['p1win']} fat={r['fat']}": r["count"]
                for r in sc0.groupBy(
                    ((F.col("est_jaccard") >= CFG.jaccard_threshold)
                     | (F.col("hamming") <= CFG.hamming_threshold)).alias("p1win"),
                    F.col("containment").isNotNull().alias("fat"),
                ).count().collect()
            }
            timings["_verify_census"] = census
            release_scored_cache()

        def build_labels():
            out = connected_components(edges).persist()
            out.count()
            return out

        labels = timed("connected_components", build_labels)
        from uncp_spark.operators import components as _cc
        cc_stats = dict(getattr(_cc, "LAST_RUN_STATS", {}) or {})

        def build_priority():
            out = priority_ranked(cluster_stats(label_all(files, labels)))
            if capture:
                save_plan("priority", out)
            out = out.persist()
            out.count()
            return out

        clusters = timed("priority", build_priority)

        if pass_i < args.passes - 1:
            for df in (files, ec, pairs, edges, labels, clusters):
                df.unpersist(blocking=True)
            spark.catalog.clearCache()

    # --- aux queries, sub-phased ---
    def q_text():
        from uncp_spark.functions.text import quality_score, token_count
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        q = d.select(token_count(F.col("text")).alias("t"),
                     quality_score(F.col("text")).alias("q")).agg(
            F.sum("t"), F.avg("q"))
        save_plan("text_metrics", q)
        q.collect()

    timed("text_metrics", q_text)

    def q_tpch():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        q = (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
             .groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum("l_quantity"), F.count("*")))
        save_plan("tpch_q1", q)
        q.collect()

    timed("tpch_q1", q_tpch)

    # ann_topk: isolate the dim probe, the derive-bits count, candidate
    # generation, and the re-rank
    from uncp_spark.functions.similarity_search import (
        ann_candidate_ids, ann_topk, derive_rp_bits,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim_holder = {}
    timed("ann.dim_probe",
          lambda: dim_holder.setdefault("dim", len(emb.select("embedding").first()[0])))
    dim = dim_holder["dim"]
    bits_holder = {}
    timed("ann.derive_bits_count",
          lambda: bits_holder.setdefault("bits", derive_rp_bits(emb.count())))
    bits = bits_holder["bits"]
    cand, _hot = ann_candidate_ids(emb, dim, bits, tables=4)
    timed("ann.candidates", lambda: noop(cand))

    def q_ann():
        topk, hot = ann_topk(emb, k=5, dim=dim, tables=4, return_report=True)
        save_plan("ann_topk", topk)
        topk.count()
        hot.count()

    timed("ann_topk", q_ann)

    timings["_cc_stats"] = cc_stats
    timings["_bits"] = bits
    spark.stop()
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
