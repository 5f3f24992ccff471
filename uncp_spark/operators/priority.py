"""S7 — cluster priority scoring + ranked dedup-candidate views.

Implements uncp's designed priority queries (DESIGN.md:283-288 "groups
by total size / largest groups"; A9/W1 in SURVEY.md) with the
north_rule's score inputs: bytes reclaimable, duplicate count, path
depth.

  bytes_reclaimable = sum(size) - max(size)   (keep one copy)
  dup_count         = member count
  min_depth         = shallowest member (shallow = more canonical)

Canonical-member election per cluster: shallowest path, then
lexicographic — row_number over the cluster window (replaces uncp's
arbitrary uuid-first semantics with a deterministic choice, F8).

Scale note: ranking windows run over the *cluster* table (≪ files) —
an unpartitioned window over clusters is fine up to ~10^8 clusters;
beyond that, rank only the top-K via orderBy + limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_stats(labeled_files: DataFrame, min_count: int = 2) -> DataFrame:
    """labeled files(file_id, cluster_id, size, depth, path, repo) →
    one row per cluster with priority inputs."""
    return (
        labeled_files.groupBy("cluster_id")
        .agg(
            F.count("*").alias("dup_count"),
            (F.sum("size") - F.max("size")).alias("bytes_reclaimable"),
            F.sum("size").alias("total_size"),
            F.min("depth").alias("min_depth"),
            F.countDistinct("repo").alias("n_repos"),
        )
        .filter(F.col("dup_count") >= min_count)
    )


def priority_ranked(clusters: DataFrame) -> DataFrame:
    """Ranked dedup candidates — bytes reclaimable first, then dup count,
    then shallowest path. ``metadata`` carries the score inputs as a JSON
    blob (uncp's group metadata field, src/relations.rs:415 / F9) and
    ``reclaimable_human`` the B/KB/MB rendering (tui df_render F10)."""
    order = [
        F.desc("bytes_reclaimable"),
        F.desc("dup_count"),
        F.asc("min_depth"),
        F.asc("cluster_id"),
    ]
    w = Window.orderBy(*order)
    return (
        clusters.withColumn("priority_rank", F.row_number().over(w))
        .withColumn(
            "metadata",
            F.to_json(F.struct("dup_count", "bytes_reclaimable", "min_depth", "n_repos")),
        )
        .withColumn("reclaimable_human", format_bytes(F.col("bytes_reclaimable")))
    )


def format_bytes(col) -> "F.Column":
    """Human-readable byte size (tui/src/df_render.rs:18-31 parity)."""
    return (
        F.when(col >= 1024**4, F.concat(F.round(col / 1024**4, 2).cast("string"), F.lit(" TB")))
        .when(col >= 1024**3, F.concat(F.round(col / 1024**3, 2).cast("string"), F.lit(" GB")))
        .when(col >= 1024**2, F.concat(F.round(col / 1024**2, 2).cast("string"), F.lit(" MB")))
        .when(col >= 1024, F.concat(F.round(col / 1024, 2).cast("string"), F.lit(" KB")))
        .otherwise(F.concat(col.cast("string"), F.lit(" B")))
    )


def elect_canonical(labeled_files: DataFrame) -> DataFrame:
    """Per-cluster canonical member: keep the shallowest, lexicographically
    first path; all other members are deletion candidates."""
    w = Window.partitionBy("cluster_id").orderBy(F.asc("depth"), F.asc("path"), F.asc("file_id"))
    return labeled_files.withColumn(
        "is_canonical", F.row_number().over(w) == 1
    )


def register_views(spark, clusters_ranked: DataFrame, labeled: DataFrame) -> None:
    """Expose the north_star's 'priority-ordered dedup candidate lists as
    Spark SQL queries'."""
    clusters_ranked.createOrReplaceTempView("cluster_priority")
    elect_canonical(labeled).createOrReplaceTempView("file_clusters")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW dedup_candidates AS
        SELECT f.cluster_id, f.repo, f.path, f.size, f.is_canonical,
               c.bytes_reclaimable, c.dup_count, c.priority_rank
        FROM file_clusters f JOIN cluster_priority c USING (cluster_id)
        WHERE NOT f.is_canonical
        ORDER BY c.priority_rank, f.path
        """
    )
