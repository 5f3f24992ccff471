"""S0 — ingest + per-row invariants.

Reference parity: uncp's discovery emits (path, size, mtime, file_type)
rows (src/systems/discovery.rs:102-229) and the hashing system computes
a content hash per file (src/systems/hashing.rs:177-218, blake3). Here
the input table already carries ``content``; ingest derives the columns
every later tier keys on:

  file_id   xxhash64(repo, path)           — compact join key (replaces
            uncp's interned (idx, gen) path ids, src/paths.rs:16-104;
            Parquet dictionary-encodes strings so the arena is
            unnecessary, the surrogate only shrinks shuffle payloads)
  sha256    sha2(content, 256)             — exact-dup key (north_rule
            fixes sha256 where uncp uses blake3)
  size      length-in-bytes of content
  depth     path component count           — priority-score input
            (src/paths.rs:360-370)
  filename  last path component            — SameFileName key
            (src/paths.rs:190-207)
  ext       lowercased extension           — predicate input
            (src/paths.rs:325-340)

All JVM-side built-ins — whole-stage codegen, no Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest(repos: DataFrame) -> DataFrame:
    """repos(repo, path, commit, lang, content, ...) → t_files."""
    return repos.withColumns(
        {
            "file_id": F.xxhash64("repo", "path"),
            "sha256": F.sha2(F.col("content"), 256),
            "size": F.octet_length("content").cast("long"),
            "depth": F.size(F.split(F.col("path"), "/")),
            "filename": F.substring_index(F.col("path"), "/", -1),
            "ext": F.lower(F.substring_index(F.col("path"), ".", -1)),
        }
    )
