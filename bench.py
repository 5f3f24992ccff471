#!/usr/bin/env python
"""Benchmark harness — runs the headline dedup pipeline + operator
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "files_per_sec": ...}

The dedup corpus is derived deterministically from the driver's
``documents`` table, amplified ×BENCH_AMPLIFY (default 8) with planted
exact duplicates and near-duplicate variants, so MinHash-LSH throughput
is measured on a corpus with realistic dup structure.

Scaling evidence (north_rule: ≥0.8 efficiency N→4N executors, measured
here as local[8] vs local[32]): scripts/run_scaling.py runs this file
twice in fresh JVMs and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uncp_spark.config import SimilarityConfig
from uncp_spark.operators.components import connected_components, label_all
from uncp_spark.operators.exact import (
    exact_cluster_edges,
    exact_clusters,
    exact_representatives,
)
from uncp_spark.operators.containment_index import combined_candidate_pairs
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.priority import cluster_stats, priority_ranked

from uncp_spark.operators.signatures import signature_table
from uncp_spark.operators.verify import accept_edges, score_pairs
from uncp_spark.session import ensure_parallelism, get_spark, warm_python_workers

CFG = SimilarityConfig()


def bench_corpus(spark, sf_dir: str, amplify: int, content_repeat: int = 1,
                 group_size: int = 4):
    """documents × amplify variants with BOUNDED duplicate-group sizes.

    Variants are split into families of ``group_size``: within a family,
    member 0 is the base, member 1 an exact copy, the rest near-dup
    forks (small token tail). Different families of the same doc get a
    long family-specific token block that pushes cross-family Jaccard
    below LSH reach — so dup-group size stays ~group_size no matter how
    large ``amplify`` is (a 10^12-file corpus has bounded dup
    multiplicity per cluster, not 100-member cliques; pair volume must
    scale linearly with amplification). ``content_repeat`` concatenates
    the base text k times so per-file work approximates real source
    files. Pure column expressions → deterministic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    if content_repeat > 1:
        docs = docs.withColumn(
            "text", F.concat_ws(" ", *([F.col("text")] * content_repeat))
        )
    variants = spark.range(amplify).select(F.col("id").alias("variant"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    fam = (F.col("variant") / group_size).cast("long")
    member = F.col("variant") % group_size
    # family-specific block, ~2x the base token count, tokens unique per
    # (doc, family, position) → cross-family/cross-doc Jaccard stays
    # below LSH reach (full doc_id in the token — a truncated id would
    # silently re-create giant accidental cliques)
    n_tail = F.size(F.split(F.col("text"), " ")) * 2
    fam_block = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tail),
            lambda i: F.concat(
                F.lit("f"), fam.cast("string"), F.lit("d"),
                F.col("doc_id").cast("string"), F.lit("p"), i.cast("string")
            ),
        ),
    )
    base = F.concat(F.col("text"), F.lit(" "), fam_block)
    return (
        docs.crossJoin(F.broadcast(variants))
        .repartition(n_part)
        .select(
            F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string"),
                     F.lit("/"), F.col("source")).alias("repo"),
            F.concat(F.lit("docs/v"), F.col("variant").cast("string"),
                     F.lit("/doc_"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.lit("deadbeef").alias("commit"),
            F.col("lang"),
            F.when(member <= 1, base)
            .otherwise(
                F.concat(base, F.lit(" variant tail token "),
                         F.col("variant").cast("string"))
            ).alias("content"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    amplify = int(os.environ.get("BENCH_AMPLIFY", "8"))
    content_repeat = int(os.environ.get("BENCH_CONTENT_REPEAT", "1"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(cpus, app_name="uncp_spark_bench")
    t_warm = time.monotonic()
    warm_python_workers(spark)
    warmup_sec = round(time.monotonic() - t_warm, 3)
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    repos = bench_corpus(spark, sf_dir, amplify, content_repeat)
    passes = int(os.environ.get("BENCH_PASSES", "4"))
    cold_timings: dict[str, float] = {}
    pass_timings: list[dict[str, float]] = []
    ckpt_dir = tempfile.mkdtemp(prefix="uncp_bench_")
    sig_path = os.path.join(ckpt_dir, "sigs.parquet")

    # --- dedup pipeline, stage by stage (persist barriers = honest
    # timing). Pass 0 is COLD (first-touch page zeroing on this sandbox
    # VM is serialized at ~60 MB/s, so it measures the hypervisor, not
    # the engine); passes 1..N-1 are WARM (steady-state executors — the
    # regime a long-lived cluster runs in). Cold numbers are kept in
    # `cold_queries`.
    for pass_i in range(passes):
        timings = {}
        files = timed("ingest", lambda: ingest(repos).persist())
        n_files = files.count()

        ec = timed("exact_tier", lambda: exact_clusters(files).persist())
        ec.count()

        def build_sigs():
            # parquet checkpoint, exactly like DedupPipeline's sigs stage:
            # one compute + write, then column-PRUNED reads downstream.
            # FIXED-WIDTH columns only — the fat shingle arrays never
            # leave the UDF workers (no Arrow return, no parquet write);
            # the verify stage recomputes them from content for exactly
            # the residual-candidate members (signatures.shingle_sets).
            reps = ensure_parallelism(exact_representatives(files))
            s = signature_table(reps, CFG, include_shingles=False).select(
                "file_id", "repo", "path", "lang", "size", "depth",
                "minhash", "simhash", "n_shingles", "bottomk",
            )
            s.write.mode("overwrite").parquet(sig_path)
            out = spark.read.parquet(sig_path)
            out.count()
            return out

        sigs = timed("signatures", build_sigs)

        def build_pairs():
            # band tier + containment-sketch tier, same as DedupPipeline
            p, _hot_b, _hot_s = combined_candidate_pairs(sigs, CFG)
            p = p.persist()
            p.count()
            return p

        pairs = timed("lsh_pairs", build_pairs)

        def build_edges():
            from uncp_spark.operators.verify import release_scored_cache

            e = accept_edges(score_pairs(pairs, sigs, CFG, files), CFG).select("src", "dst")
            e = e.unionByName(exact_cluster_edges(files).select("src", "dst")).persist()
            e.count()
            release_scored_cache()
            return e

        edges = timed("verify_edges", build_edges)

        # local-checkpoint mode: each probe is ONE job (the lazy cut
        # materializes inside the checksum agg), blocks stay in executor
        # memory. Measured against reliable-parquet probes at the bench
        # corpus: the parquet writes ride this VM's serialized disk path
        # and cost 2-3x CC wall time, while on a real cluster the labels
        # stage runs DedupPipeline's parquet+observed-metrics mode for
        # fault tolerance (same probe structure, one write job per probe)
        labels = timed("connected_components",
                       lambda: connected_components(edges).persist())
        labels.count()

        def build_priority():
            out = priority_ranked(cluster_stats(label_all(files, labels))).persist()
            out.count()
            return out

        clusters = timed("priority", build_priority)
        n_clusters = clusters.count()

        pass_timings.append(dict(timings))
        if pass_i == 0:
            cold_timings = dict(timings)
        if pass_i < passes - 1:
            for df in (files, ec, pairs, edges, labels, clusters):
                df.unpersist(blocking=True)
            spark.catalog.clearCache()

    PIPELINE_KEYS = ["ingest", "exact_tier", "signatures", "lsh_pairs",
                     "verify_edges", "connected_components", "priority"]

    def pipe_sec(t: dict) -> float:
        return round(sum(t[k] for k in PIPELINE_KEYS), 3)

    # Headline = the MEDIAN warm pass (an actual run, so its per-stage
    # numbers sum to the headline; UPPER-middle when the count is even —
    # with 2 warm passes the lower-middle would be min(), harvesting a
    # single favorable burst, so the even-count tie breaks conservative).
    # One warm pass is statistically worthless on this VM — co-tenant
    # bursts run up to 2.4x — and min() would harvest favorable noise;
    # the median of >=3 warm passes damps both directions. All per-pass
    # totals are emitted so measurement health is auditable
    # (noise_spread = max/min warm).
    warm_passes = pass_timings[1:] if len(pass_timings) > 1 else pass_timings
    warm_secs = sorted(pipe_sec(t) for t in warm_passes)
    median_sec = warm_secs[len(warm_secs) // 2]
    median_pass = next(t for t in warm_passes if pipe_sec(t) == median_sec)
    warm_pipeline_sec = median_sec
    noise_spread = (
        round(warm_secs[-1] / warm_secs[0], 3) if warm_secs[0] else None
    )

    # --- auxiliary operator queries on driver tables
    docs_path = f"{sf_dir}/documents.parquet"

    def q_text():
        from uncp_spark.functions.text import quality_score, token_count
        d = spark.read.parquet(docs_path)
        d.select(token_count(F.col("text")).alias("t"),
                 quality_score(F.col("text")).alias("q")).agg(
            F.sum("t"), F.avg("q")).collect()

    timed("text_metrics", q_text)

    def q_tpch():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum("l_quantity"), F.count("*")).collect())

    timed("tpch_q1", q_tpch)

    ann_hot_buckets = {}

    def q_ann():
        from uncp_spark.functions.similarity_search import ann_topk
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dim = len(emb.select("embedding").first()[0])
        # bits=None: the scale-safe default (derived from corpus size —
        # fixed widths go quadratic at some corpus size). The hot-bucket
        # report is COUNTED into the headline artifact, not discarded:
        # skew that the cap quarantined is observable here.
        topk, hot = ann_topk(emb, k=5, dim=dim, tables=4, return_report=True)
        topk.count()
        ann_hot_buckets["n"] = hot.count()

    timed("ann_topk", q_ann)

    aux_timings = {k: v for k, v in timings.items() if k not in PIPELINE_KEYS}
    total = round(sum(aux_timings.values()) + warm_pipeline_sec, 3)
    cold_pipeline_sec = pipe_sec(cold_timings) if cold_timings else None
    headline_pass = "warm_median" if passes > 1 else "cold"
    pipeline_sec = warm_pipeline_sec
    queries_out = {**median_pass, **aux_timings}
    result = {
        "metric": "dedup_pipeline_e2e",
        "value": pipeline_sec,
        "unit": "sec",
        "headline_pass": headline_pass,
        "cold_pipeline_sec": cold_pipeline_sec,
        "cold_files_per_sec": (
            round(n_files / cold_pipeline_sec, 1) if cold_pipeline_sec else None
        ),
        "warm_pipeline_sec": warm_pipeline_sec,
        "warm_files_per_sec": round(n_files / warm_pipeline_sec, 1),
        "queries": queries_out,
        "sf": sf,
        "total_sec": total,
        "n_files": n_files,
        "n_clusters": n_clusters,
        "files_per_sec": round(n_files / pipeline_sec, 1) if pipeline_sec else None,
        "cores": cpus,
        "ann_hot_buckets": ann_hot_buckets.get("n"),
        "amplify": amplify,
        "content_repeat": content_repeat,
        "worker_warmup_sec": warmup_sec,
        "passes": passes,
        "noise_spread": noise_spread,
        "pass_pipeline_secs": [pipe_sec(t) for t in pass_timings],
        # full per-pass stage timings: measurement health is auditable
        # per stage, not just per pipeline total
        "pass_queries": pass_timings,
        "cold_queries": cold_timings or None,
    }
    spark.stop()
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
