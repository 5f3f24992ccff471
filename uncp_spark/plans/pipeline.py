"""The end-to-end dedup pipeline (SURVEY.md §7.1) with checkpoint/resume.

uncp's engine loop (src/engine.rs:202-492) repeatedly asks "is there
pending work?" (pending-hash count, src/data.rs:275-288) and runs the
next system; a kill loses ≤5 s thanks to autosave. Here each stage is a
checkpointed table and the loop collapses to "first incomplete stage
wins" — rerunning the pipeline after a kill recomputes only missing
stages (tested in tests/test_resume.py).

Stage graph:
    files   = ingest(repos)                      sha256/size/depth
    sigs    = minhash+simhash(shingle(reps))     reps = 1 row per sha256
    pairs   = LSH candidates (+ hot-bucket report)
    edges   = verified pairs ∪ exact-tier star edges
    labels  = connected components
    clusters= priority-ranked cluster stats

Every checkpoint manifest chains the upstream manifest token, giving
per-stage lineage; per-partition row counts are embedded (north_rule's
"per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig
from uncp_spark.operators.components import connected_components, label_all
from uncp_spark.operators.exact import exact_cluster_edges, exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.lsh import candidate_pairs
from uncp_spark.operators.signatures import with_signatures
from uncp_spark.operators.priority import cluster_stats, priority_ranked, register_views, elect_canonical
from uncp_spark.operators.shingle import with_shingles
from uncp_spark.operators.verify import accept_edges, score_pairs
from uncp_spark.session import compute_repartition
from uncp_spark.sources import checkpoint as ckpt

SIG_COLS = ["file_id", "repo", "path", "lang", "size", "depth",
            "minhash", "simhash", "shingles", "n_shingles"]


@dataclass
class DedupPipeline:
    base_dir: str
    cfg: SimilarityConfig = SimilarityConfig()

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _run_stage(
        self,
        spark: SparkSession,
        name: str,
        input_token: str,
        build: "callable",
        results: list,
        resume: bool,
    ) -> tuple[DataFrame, str]:
        path = self._stage_dir(name)
        chash = self.cfg.config_hash()
        if resume and ckpt.is_complete(path, chash, input_token):
            df = ckpt.read_checkpoint(spark, path)
            m = ckpt.read_manifest(path) or {}
            results.append(ckpt.StageResult(name, path, m.get("rows", -1), 0.0, True, m))
        else:
            df = build()
            results.append(ckpt.write_checkpoint(df, path, name, chash, input_token))
            df = ckpt.read_checkpoint(spark, path)
        return df, ckpt.manifest_token(path)

    def run(
        self,
        spark: SparkSession,
        repos: DataFrame,
        input_token: str,
        resume: bool = True,
        register_sql_views: bool = True,
    ) -> dict:
        """Run (or resume) the full pipeline. Returns dict of output
        DataFrames + stage metrics."""
        t0 = time.monotonic()
        os.makedirs(self.base_dir, exist_ok=True)
        results: list[ckpt.StageResult] = []
        cfg = self.cfg

        files, tok = self._run_stage(
            spark, "files", input_token, lambda: ingest(repos), results, resume
        )

        def build_sigs() -> DataFrame:
            reps = compute_repartition(exact_representatives(files))
            return with_signatures(with_shingles(reps, cfg), cfg).select(*SIG_COLS)

        sigs, tok_sigs = self._run_stage(spark, "sigs", tok, build_sigs, results, resume)

        def build_pairs() -> DataFrame:
            pairs, hot = candidate_pairs(sigs, cfg)
            # hot-bucket report persisted alongside (skew observability)
            hot.write.mode("overwrite").parquet(self._stage_dir("hot_buckets"))
            return pairs

        pairs, tok_pairs = self._run_stage(spark, "pairs", tok_sigs, build_pairs, results, resume)

        def build_edges() -> DataFrame:
            near = accept_edges(score_pairs(pairs, sigs, cfg), cfg)
            exact = exact_cluster_edges(files)
            return near.select("src", "dst", "score", "edge_type").unionByName(
                exact.select("src", "dst", "score", "edge_type")
            )

        edges, tok_edges = self._run_stage(spark, "edges", tok_pairs, build_edges, results, resume)

        def build_labels() -> DataFrame:
            return connected_components(edges.select("src", "dst"))

        labels, tok_labels = self._run_stage(spark, "labels", tok_edges, build_labels, results, resume)

        labeled = label_all(files, labels)

        def build_clusters() -> DataFrame:
            return priority_ranked(cluster_stats(labeled))

        clusters, _ = self._run_stage(spark, "clusters", tok_labels, build_clusters, results, resume)

        if register_sql_views:
            register_views(spark, clusters, labeled)

        total = time.monotonic() - t0
        run_report = {
            "total_seconds": round(total, 3),
            "config_hash": cfg.config_hash(),
            "stages": [
                {"stage": r.name, "rows": r.rows, "seconds": round(r.seconds, 3),
                 "resumed": r.resumed}
                for r in results
            ],
        }
        with open(os.path.join(self.base_dir, "_run.json"), "w") as f:
            json.dump(run_report, f, indent=1)
        return {
            "files": files,
            "sigs": sigs,
            "pairs": pairs,
            "edges": edges,
            "labels": labels,
            "labeled": labeled,
            "clusters": clusters,
            "report": run_report,
        }
