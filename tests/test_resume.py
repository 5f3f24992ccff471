"""Pipeline integration + resume-from-kill (SURVEY.md §5 test plan f/g):
kill after stage k, rerun, final clusters byte-identical; determinism:
two runs ⇒ identical cluster ids."""

from __future__ import annotations

import os
import shutil

import pytest

from uncp_spark.config import SimilarityConfig
from uncp_spark.plans.pipeline import DedupPipeline


def _cluster_map(out):
    return sorted(
        (r["file_id"], r["cluster_id"])
        for r in out["labeled"].select("file_id", "cluster_id").collect()
    )


@pytest.fixture(scope="module")
def first_run(spark, repos_df, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt"))
    pipe = DedupPipeline(base_dir=base)
    out = pipe.run(spark, repos_df, input_token="fixture")
    # materialize eagerly: later tests rewrite the checkpoint dirs these
    # DataFrames lazily reference
    labeled_rows = out["labeled"].select(
        "file_id", "cluster_id", "dup_class", "dup_group"
    ).collect()
    n_clusters = out["clusters"].count()
    stage_names = [s["stage"] for s in out["report"]["stages"]]
    summary = {"labeled_rows": labeled_rows, "n_clusters": n_clusters,
               "stages": stage_names}
    return base, pipe, summary, _cluster_map(out)


def test_pipeline_end_to_end(first_run):
    _, _, summary, clusters = first_run
    assert summary["n_clusters"] > 0
    assert len(clusters) > 0
    assert summary["stages"] == ["files", "sigs", "pairs", "edges", "labels", "clusters"]


def test_full_resume_skips_everything(spark, repos_df, first_run):
    base, pipe, _, clusters = first_run
    out2 = pipe.run(spark, repos_df, input_token="fixture")
    assert all(s["resumed"] for s in out2["report"]["stages"])
    assert _cluster_map(out2) == clusters


def test_kill_mid_pipeline_resumes(spark, repos_df, first_run):
    base, pipe, _, clusters = first_run
    shutil.rmtree(os.path.join(base, "labels"))
    shutil.rmtree(os.path.join(base, "clusters"))
    out = pipe.run(spark, repos_df, input_token="fixture")
    flags = {s["stage"]: s["resumed"] for s in out["report"]["stages"]}
    assert flags == {"files": True, "sigs": True, "pairs": True,
                     "edges": True, "labels": False, "clusters": False}
    assert _cluster_map(out) == clusters


def test_incomplete_checkpoint_not_resumed(spark, repos_df, first_run):
    """A stage dir without _SUCCESS (simulated mid-write kill) recomputes."""
    base, pipe, _, clusters = first_run
    os.remove(os.path.join(base, "pairs", "_SUCCESS"))
    out = pipe.run(spark, repos_df, input_token="fixture")
    flags = {s["stage"]: s["resumed"] for s in out["report"]["stages"]}
    assert flags["pairs"] is False
    assert _cluster_map(out) == clusters


def test_config_change_invalidates(spark, repos_df, first_run):
    base, _, _, _ = first_run
    pipe = DedupPipeline(base_dir=base, cfg=SimilarityConfig(hamming_threshold=2))
    out = pipe.run(spark, repos_df, input_token="fixture")
    assert not any(s["resumed"] for s in out["report"]["stages"])


def test_determinism_two_fresh_runs(spark, repos_df, tmp_path_factory, first_run):
    _, _, _, clusters = first_run
    base2 = str(tmp_path_factory.mktemp("ckpt2"))
    out2 = DedupPipeline(base_dir=base2).run(spark, repos_df, input_token="fixture")
    assert _cluster_map(out2) == clusters


def test_input_change_same_rowcount_invalidates_downstream(
    spark, repos_df, tmp_path_factory
):
    """ADVICE r1 (high): a changed input corpus with the SAME row count
    must invalidate every downstream stage — the manifest token chain
    carries a per-write nonce, so rebuilding 'files' (new input_token)
    cascades through sigs/pairs/edges/labels/clusters even though the
    files row count is unchanged."""
    from pyspark.sql import functions as F

    base = str(tmp_path_factory.mktemp("ckpt_input_change"))
    pipe = DedupPipeline(base_dir=base)
    pipe.run(spark, repos_df, input_token="v1")

    # same schema, same row count, one file's content edited
    first_path = repos_df.select("path").orderBy("repo", "path").first()[0]
    repos2 = repos_df.withColumn(
        "content",
        F.when(
            F.col("path") == first_path,
            F.concat(F.col("content"), F.lit(" corpus edit marker xyzzy")),
        ).otherwise(F.col("content")),
    )
    assert repos2.count() == repos_df.count()
    out2 = pipe.run(spark, repos2, input_token="v2")
    flags = {s["stage"]: s["resumed"] for s in out2["report"]["stages"]}
    assert not any(flags.values()), f"stale resume after input change: {flags}"


def test_planted_groups_cocluster(first_run):
    """≥95% of planted dup groups end in one cluster (the stragglers are
    mutations below the pinned thresholds, by design)."""
    from collections import defaultdict

    _, _, summary, _ = first_run
    groups = defaultdict(set)
    for r in summary["labeled_rows"]:
        if r["dup_group"] >= 0:
            groups[(r["dup_class"], r["dup_group"])].add(r["cluster_id"])
    total = len(groups)
    split = sum(1 for v in groups.values() if len(v) > 1)
    assert total > 10
    assert split / total <= 0.05, f"{split}/{total} planted groups split"


def test_merge_checkpoint_relation_store(spark, tmpdir_path):
    """S7 relation merge-on-save (uncp src/relations.rs:285-293): a
    second save's rows win per key, keys only in the first save survive
    — repeated scans accumulate the union, never replace."""
    import os

    from uncp_spark.sources import checkpoint as ckpt

    path = os.path.join(tmpdir_path, "same_name")
    v1 = spark.createDataFrame(
        [("a.txt", 2, 100), ("b.txt", 3, 300)],
        "filename_key string, file_count long, total_size long",
    )
    ckpt.merge_checkpoint(v1, path, "same_name", "cfg", "t1",
                          keys=["filename_key"])
    v2 = spark.createDataFrame(
        [("b.txt", 5, 999), ("c.txt", 2, 50)],
        "filename_key string, file_count long, total_size long",
    )
    res = ckpt.merge_checkpoint(v2, path, "same_name", "cfg", "t2",
                                keys=["filename_key"])
    got = {
        r.filename_key: (r.file_count, r.total_size)
        for r in spark.read.parquet(path).collect()
    }
    # a: old-only key survives; b: NEW row wins; c: added
    assert got == {"a.txt": (2, 100), "b.txt": (5, 999), "c.txt": (2, 50)}
    assert res.rows == 3
    m = ckpt.read_manifest(path)
    assert m["input_token"] == "t2" and m["complete"] is True
    assert not os.path.exists(path + ".merge_tmp")
    assert not os.path.exists(path + ".merge_old")


def test_merge_checkpoint_recovers_mid_swap_crash(spark, tmpdir_path):
    """Crash between the two renames leaves .merge_old as the only valid
    copy; the next merge must restore it and keep accumulating."""
    import os

    from uncp_spark.sources import checkpoint as ckpt

    path = os.path.join(tmpdir_path, "rel")
    v1 = spark.createDataFrame([("a", 1)], "k string, v long")
    ckpt.merge_checkpoint(v1, path, "rel", "cfg", "t1", keys=["k"])
    # simulate: state renamed away, tmp never landed
    os.rename(path, path + ".merge_old")
    v2 = spark.createDataFrame([("b", 2)], "k string, v long")
    ckpt.merge_checkpoint(v2, path, "rel", "cfg", "t2", keys=["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 2}, "accumulated store was lost in the crash"
    assert not os.path.exists(path + ".merge_old")


def test_merge_checkpoint_null_keys_replace_not_duplicate(spark, tmpdir_path):
    import os

    from uncp_spark.sources import checkpoint as ckpt

    path = os.path.join(tmpdir_path, "nullk")
    v1 = spark.createDataFrame([(None, 1), ("x", 1)], "k string, v long")
    ckpt.merge_checkpoint(v1, path, "nullk", "cfg", "t1", keys=["k"])
    v2 = spark.createDataFrame([(None, 9)], "k string, v long")
    ckpt.merge_checkpoint(v2, path, "nullk", "cfg", "t2", keys=["k"])
    rows = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {(None, 9), ("x", 1)}, rows


def test_save_relation_accumulates_across_scans(spark, tmpdir_path):
    """The registry's merge-on-save surface: two scans' same_name
    relations accumulate per filename key, the later scan winning on
    overlap (uncp src/relations.rs:285-293)."""
    import os

    from uncp_spark.fixtures import FixtureSpec, make_repos
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.plans.registry import save_relation

    f1 = ingest(make_repos(spark, FixtureSpec(n_repos=4, files_per_repo=3,
                                              seed=1)))
    f2 = ingest(make_repos(spark, FixtureSpec(n_repos=4, files_per_repo=3,
                                              seed=2)))
    save_relation("same_name", f1, tmpdir_path, "cfg", "scan1")
    r2 = save_relation("same_name", f2, tmpdir_path, "cfg", "scan2")
    store = spark.read.parquet(os.path.join(tmpdir_path, "same_name"))
    keys = {r.filename_key for r in store.select("filename_key").collect()}
    k1 = {r.filename_key for r in
          spark.read.parquet(os.path.join(tmpdir_path, "same_name"))
          .collect()}
    only_scan1 = {
        r.filename_key
        for r in __import__("uncp_spark.operators.exact",
                            fromlist=["same_name_groups"])
        .same_name_groups(f1).select("filename_key").collect()
    }
    only_scan2 = {
        r.filename_key
        for r in __import__("uncp_spark.operators.exact",
                            fromlist=["same_name_groups"])
        .same_name_groups(f2).select("filename_key").collect()
    }
    assert keys == only_scan1 | only_scan2
    assert r2.rows == len(keys)


def test_checkpoint_write_is_single_scan(spark, tmpdir_path):
    """Round-3 verdict defect #6: the post-write per-partition metrics
    used to be a SECOND full scan of the checkpoint (doubling checkpoint
    read I/O at 100 TB). Now the write job is the only Spark job a
    checkpoint costs — rows and per-partition lineage come from the
    parquet footers (asserted via statusTracker job counts), and the
    manifest shape is unchanged."""
    import os

    from uncp_spark.sources import checkpoint as ckpt

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, s string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("ckpt-single-scan", "checkpoint write probe")
    try:
        res = ckpt.write_checkpoint(
            df, os.path.join(tmpdir_path, "st"), "st", "cfg", "t1"
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("ckpt-single-scan")
    assert len(jobs) == 1, f"checkpoint write ran {len(jobs)} jobs: {jobs}"
    assert res.rows == 100
    pm = res.manifest["partition_metrics"]
    assert sum(p["rows"] for p in pm) == 100
    assert all(p["bytes"] > 0 for p in pm)
    assert [p["partition_id"] for p in pm] == list(range(len(pm)))
    # footer-derived metrics must agree with an actual scan
    assert spark.read.parquet(res.path).count() == 100


def test_save_relation_version_mismatch_refuses(spark, tmpdir_path):
    """X2 schema-version enforcement (uncp RelationKey::version,
    src/relations.rs:58-61; persisted meta version, src/persist.rs:15-20):
    the store manifest carries the producer's version, and a save from a
    producer with a DIFFERENT version refuses loudly instead of silently
    merging rows whose columns changed meaning."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from uncp_spark.fixtures import FixtureSpec, make_repos
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.plans.registry import register_relation, save_relation
    from uncp_spark.sources.checkpoint import read_manifest

    files = ingest(make_repos(spark, FixtureSpec(n_repos=3, files_per_repo=3,
                                                 seed=5)))

    def producer(f):
        return f.select(F.col("filename").alias("k"), F.col("size").alias("v"))

    register_relation("ver_probe", "version probe", ["k", "v"], producer,
                      version=1, merge_keys=["k"])
    save_relation("ver_probe", files, tmpdir_path, "cfg", "scan1")
    store = os.path.join(tmpdir_path, "ver_probe")
    assert read_manifest(store)["relation_version"] == 1

    # same name re-registered at version 2 (columns re-meaning'd)
    register_relation("ver_probe", "version probe v2", ["k", "v"], producer,
                      version=2, merge_keys=["k"])
    with pytest.raises(ValueError, match="version"):
        save_relation("ver_probe", files, tmpdir_path, "cfg", "scan2")
    # the v1 store is untouched by the refused save
    m = read_manifest(store)
    assert m["relation_version"] == 1 and m["input_token"] == "scan1"

    # back at the matching version, saves keep working
    register_relation("ver_probe", "version probe", ["k", "v"], producer,
                      version=1, merge_keys=["k"])
    save_relation("ver_probe", files, tmpdir_path, "cfg", "scan3")
    assert read_manifest(store)["input_token"] == "scan3"
