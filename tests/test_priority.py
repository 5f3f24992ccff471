"""Priority scoring vs hand-computed values (SURVEY.md §5 test plan e)."""

from __future__ import annotations

from uncp_spark.operators.priority import cluster_stats, elect_canonical, priority_ranked

ROWS = [
    # file_id, cluster_id, size, depth, path, repo
    (1, 1, 100, 3, "a/b/x.py", "r1"),
    (2, 1, 100, 1, "x.py", "r2"),
    (3, 1, 100, 2, "c/x.py", "r3"),
    (4, 4, 1000, 2, "d/big.rs", "r1"),
    (5, 4, 900, 5, "e/f/g/h/big.rs", "r2"),
    (6, 6, 50, 1, "lone.md", "r1"),  # singleton → filtered out
]
SCHEMA = "file_id long, cluster_id long, size long, depth int, path string, repo string"


def test_cluster_stats_and_rank(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    stats = {r["cluster_id"]: r.asDict() for r in cluster_stats(df).collect()}
    assert set(stats) == {1, 4}
    assert stats[1]["bytes_reclaimable"] == 200      # 300 - 100
    assert stats[4]["bytes_reclaimable"] == 900      # 1900 - 1000
    assert stats[1]["dup_count"] == 3
    assert stats[1]["min_depth"] == 1
    assert stats[1]["n_repos"] == 3

    ranked = {r["cluster_id"]: r["priority_rank"]
              for r in priority_ranked(cluster_stats(df)).collect()}
    assert ranked == {4: 1, 1: 2}  # more bytes reclaimable wins


def test_elect_canonical(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    canon = {
        r["cluster_id"]: r["path"]
        for r in elect_canonical(df).filter("is_canonical").collect()
    }
    assert canon[1] == "x.py"        # shallowest
    assert canon[4] == "d/big.rs"
    assert canon[6] == "lone.md"


def test_sql_views(spark):
    from uncp_spark.operators.priority import register_views

    df = spark.createDataFrame(ROWS, SCHEMA)
    register_views(spark, priority_ranked(cluster_stats(df)), df)
    top = spark.sql(
        "SELECT cluster_id, path FROM dedup_candidates ORDER BY priority_rank, path"
    ).collect()
    # cluster 4 first (rank 1); canonical members excluded
    assert top[0]["cluster_id"] == 4 and top[0]["path"] == "e/f/g/h/big.rs"
    paths = {r["path"] for r in top}
    assert "x.py" not in paths and "d/big.rs" not in paths


def test_global_rank_plans_without_actions(spark):
    """The two-pass rank (collect band counts at plan-construction time,
    then rank in a second pass over the same lineage) was part of the
    sequential-job tail that capped N→4N scaling. The band offsets now
    run in-plan as a bounded (≤ ~64-row) cumulative-sum window, so
    BUILDING the ranked plan must fire zero Spark jobs — the consuming
    stage's sink action pays for everything in one pass (AQE may split
    that action into several scheduler jobs; the property that matters
    is no mid-plan driver barrier)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    sc = spark.sparkContext
    sc.setJobGroup("rank-plan-only", "global rank plan probe")
    try:
        priority_ranked(cluster_stats(df))  # plan construction only
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("rank-plan-only")
    assert not jobs, f"plan construction ran jobs: {jobs}"
