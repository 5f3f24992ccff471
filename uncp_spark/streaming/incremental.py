"""T5 — incremental re-scan: process only new/changed files.

Reference semantics (src/detector.rs:783-885 + src/persist.rs:208-233):
on a fresh scan, (1) rows whose file vanished are dropped, (2) rows
whose size/mtime changed get ``hashed=false`` and are re-processed,
(3) unchanged rows keep their cached results, (4) new rows are added
pending. Merge-on-save keeps the union across scans.

Spark form: two anti-joins + an upsert against the previous state
snapshot — no watermarks or stateful streaming needed (there is no
event-time semantics in the source system). At production scale this is
one Iceberg MERGE INTO per scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_snapshot(
    cached: DataFrame,
    current: DataFrame,
    keys: tuple[str, ...] = ("repo", "path"),
    fingerprint_col: str = "sha256",
) -> dict[str, DataFrame]:
    """Split the new snapshot against cached state.

    Returns dict with:
      unchanged  cached rows still valid (results reusable)
      changed    current rows whose fingerprint differs (re-process)
      added      current rows not in cache (process)
      deleted    cached rows gone from current (drop)
    """
    kl = list(keys)
    cur_fp = current.select(*kl, F.col(fingerprint_col).alias("_cur_fp"))
    cached_fp = cached.select(*kl, F.col(fingerprint_col).alias("_old_fp"))

    added = current.join(cached_fp.select(*kl), kl, "left_anti")
    deleted = cached.join(cur_fp.select(*kl), kl, "left_anti")
    joined = cur_fp.join(cached_fp, kl, "inner")
    changed_keys = joined.filter(F.col("_cur_fp") != F.col("_old_fp")).select(*kl)
    unchanged_keys = joined.filter(F.col("_cur_fp") == F.col("_old_fp")).select(*kl)
    changed = current.join(changed_keys, kl, "left_semi")
    unchanged = cached.join(unchanged_keys, kl, "left_semi")
    return {"unchanged": unchanged, "changed": changed,
            "added": added, "deleted": deleted}


def apply_increment(
    cached: DataFrame,
    current: DataFrame,
    process,
    keys: tuple[str, ...] = ("repo", "path"),
    fingerprint_col: str = "sha256",
) -> DataFrame:
    """New state = unchanged cached results ∪ process(changed ∪ added).

    ``process`` is the expensive stage (hash/signature computation); it
    runs only on the delta — uncp's 'only changed files re-hashed'.
    """
    parts = diff_snapshot(cached, current, keys, fingerprint_col)
    todo = parts["changed"].unionByName(parts["added"])
    processed = process(todo)
    return parts["unchanged"].unionByName(processed)
