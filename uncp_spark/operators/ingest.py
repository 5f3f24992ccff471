"""S0 — ingest + per-row invariants.

Reference parity: uncp's discovery emits (path, size, mtime, file_type)
rows (src/systems/discovery.rs:102-229) and the hashing system computes
a content hash per file (src/systems/hashing.rs:177-218, blake3). Here
the input table already carries ``content``; ingest derives the columns
every later tier keys on:

  file_id   md5(repo || NUL || path)       — 128-bit surrogate join key
            (replaces uncp's interned (idx, gen) path ids,
            src/paths.rs:16-104, whose uniqueness is structural; a
            64-bit hash at the stated 10^12-file design scale expects
            ~27,000 birthday-colliding pairs, each silently fusing two
            unrelated files in every tier — at 2^128 the expectation is
            ~1.5e-15, matching the interned-id guarantee
            probabilistically. NUL-separated so (repo, path) is
            injective; hex string, dictionary-encoded in parquet.)
  sha256    sha2(content, 256)             — exact-dup key (north_rule
            fixes sha256 where uncp uses blake3)
  size      length-in-bytes of content
  depth     path component count           — priority-score input
            (src/paths.rs:360-370)
  filename  last path component            — SameFileName key
            (src/paths.rs:190-207)
  ext       lowercased extension, NULL when the filename has no
            extension (dotless, or a leading-dot-only name like
            ``.gitignore``) — predicate input, same null semantics as
            the reference (src/paths.rs:325-340, Path::extension)

All JVM-side built-ins — whole-stage codegen, no Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest(repos: DataFrame, processed_at_ns: int | None = None) -> DataFrame:
    """repos(repo, path, commit, lang, content, ...) → t_files.

    Null content (an unreadable file in uncp terms) gets a per-row
    sentinel hash, so distinct null-content rows stay individually
    distinct: they never collapse into one exact group (sha2(null) is
    null and would), never equi-join as dup partners, and the fuzzy tier
    skips them (exact_representatives keeps only non-null content).

    ``processed_at`` (F7): i64 ns-epoch scan stamp — uncp's
    ``last_processed`` (src/data.rs:241-246). Pass ``processed_at_ns``
    to pin it (tests/oracles); default is the query-stable now."""
    from uncp_spark.functions.timefns import now_ns

    processed = (
        F.lit(processed_at_ns).cast("long")
        if processed_at_ns is not None
        else now_ns()
    )
    file_id = F.md5(F.concat_ws("\x00", F.col("repo"), F.col("path")))
    filename = F.substring_index(F.col("path"), "/", -1)
    return repos.withColumns(
        {
            "processed_at": processed,
            "file_id": file_id,
            "sha256": F.coalesce(
                F.sha2(F.col("content"), 256),
                F.concat(F.lit("nullcontent:"), file_id),
            ),
            "size": F.coalesce(F.octet_length("content").cast("long"), F.lit(0)),
            "depth": F.size(F.split(F.col("path"), "/")),
            "filename": filename,
            # extension only when the FILENAME has a dot with >=1 char
            # before it ('LICENSE', 'docs/file', '.gitignore' -> NULL;
            # 'a.b/file' must not borrow the directory's dot)
            "ext": F.when(
                filename.rlike(r".\."),
                F.lower(F.regexp_extract(filename, r"\.([^.]*)$", 1)),
            ),
        }
    )
