"""uncp_spark — a PySpark-native near-duplicate detection and
dedup-prioritization engine.

Brand-new Spark-first rebuild of the capabilities of Waridley/uncp
(reference: /root/reference, Rust + Polars). NOT a port: the reference's
ECS systems / engine loop / interned-path arena collapse into declarative
DataFrame plans, checkpointed pipeline stages, and vectorized Arrow UDFs.

Pipeline (SURVEY.md §7.1):

    repos(repo, path, commit, lang, content)
      → ingest (sha256, size, depth)            [exact tier key]
      → exact clusters (groupBy sha256)         [uncp IdenticalHashes]
      → normalize + shingle (JVM-side)          [xxhash64 k-gram shingles]
      → MinHash(128) + SimHash64 (pandas UDFs)
      → LSH banding self-join → candidate pairs [skew-capped hot buckets]
      → verify (est. Jaccard / Hamming / containment) → edges
      → connected components (large-star/small-star) → clusters
      → priority scores (bytes reclaimable, dup count, path depth)

Every stage checkpoints to Parquet with a manifest + per-partition
metrics so a killed job resumes mid-pipeline (uncp's merge-on-save
resumability, src/persist.rs:208-233, re-expressed).
"""

from uncp_spark.config import SimilarityConfig

__all__ = ["SimilarityConfig"]
__version__ = "0.1.0"
