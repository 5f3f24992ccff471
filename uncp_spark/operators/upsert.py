"""J1/J2 — upsert (left join + coalesce) and incremental invalidation.

Reference parity:
  J1  uncp merges hash results into the main table with a left join on
      the path key and when/otherwise coalesce per updated column
      (src/systems/hashing.rs:277-315).
  J2  the hand-rolled HashMap lookup join (src/data.rs:319-371) is a
      broadcast-hash-join — ``F.broadcast(updates)`` when the update
      frame is small (per-batch updates almost always are).
  S8  cache invalidation (src/detector.rs:783-885): re-stat every cached
      file; drop rows whose file vanished, reset ``hashed`` where
      size/mtime changed. Re-expressed as joins against a fresh
      snapshot — the incremental-recompute primitive.

On Iceberg this whole module is ``MERGE INTO``; the DataFrame forms here
keep identical semantics on plain Parquet checkpoints.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_columns(
    state: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Left-join state with updates on ``keys``; for each update column,
    the update value wins when present (hashing.rs:297-310 semantics)."""
    renamed = updates.select(
        *keys, *[F.col(c).alias(f"_upd_{c}") for c in update_cols]
    )
    if broadcast_updates:
        renamed = F.broadcast(renamed)
    out = state.join(renamed, list(keys), "left")
    for c in update_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_upd_{c}"), F.col(c)))
    return out.drop(*[f"_upd_{c}" for c in update_cols])


def invalidate_changed(
    cached: DataFrame,
    current: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    change_cols: Sequence[str] = ("size",),
    flag_col: str = "hashed",
) -> DataFrame:
    """S8: keep only rows still present in ``current``; reset ``flag_col``
    to false where any change column differs (content changed → re-hash).

    Returns the refreshed state: deleted rows dropped, changed rows
    flagged pending, unchanged rows untouched.
    """
    cur = current.select(
        *keys, *[F.col(c).alias(f"_cur_{c}") for c in change_cols]
    )
    joined = cached.join(cur, list(keys), "inner")  # inner = drop deleted
    changed = None
    for c in change_cols:
        cond = F.col(c) != F.col(f"_cur_{c}")
        changed = cond if changed is None else (changed | cond)
    out = joined.withColumn(
        flag_col, F.when(changed, F.lit(False)).otherwise(F.col(flag_col))
    )
    return out.drop(*[f"_cur_{c}" for c in change_cols])


def pending_rows(state: DataFrame, flag_col: str = "hashed") -> DataFrame:
    """P3 — work-queue selection (src/query.rs:124-130): rows whose stage
    flag is false."""
    return state.filter(~F.col(flag_col))
