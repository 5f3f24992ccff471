"""J4 + relation-membership queries over group tables.

Reference parity: uncp designs (never implements) membership queries —
"all groups containing a specific file" and "files that are duplicates
in one dimension but unique in another" (DESIGN.md:283-288; the typed
relation store they would run against is src/relations.rs:169-267).

The group tables here are the exact-tier relations (hash / name / size
→ member list); membership queries are explode + semi/anti equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groups_containing(groups: DataFrame, path: str,
                      members_col: str = "file_paths") -> DataFrame:
    """All group rows whose member list contains ``path`` (J4 semi form).
    array_contains stays JVM-side; no explode needed for a point probe.
    Note: group tables cap ``file_paths`` at MAX_GROUP_MEMBERS (exact.py)
    — for probes that must see past the cap, re-derive membership with a
    semi-join on the files table instead of the preview array."""
    return groups.filter(F.array_contains(F.col(members_col), path))


def members_of_groups(groups: DataFrame, members_col: str = "file_paths") -> DataFrame:
    """Explode group membership to (group key cols…, path) rows."""
    return groups.withColumn("path", F.explode(F.col(members_col))).drop(members_col)


def dup_in_one_dim_unique_in_other(
    files: DataFrame, dup_key: str, unique_key: str
) -> DataFrame:
    """Files duplicated under ``dup_key`` but unique under ``unique_key``
    — e.g. same filename in many repos (dup) with distinct content
    (unique): the 'same name, different content' relation.

    Shuffle discipline: windows hash-partition ENTIRE rows, so counting
    over the full files frame would shuffle every content byte TWICE to
    compute two integers per row. Instead the two windowed counts run
    over a 2-column projection (dup_key, unique_key) and the surviving
    unique_key values semi-join back — valid because a survivor has
    ``_n_uni == 1``, so its unique_key maps to exactly one file row.
    AQE broadcasts the key set when small; even the sort-merge worst
    case is ONE full-row exchange instead of two. (Null unique keys are
    excluded — a null key is not meaningfully "unique".)
    """
    from pyspark.sql import Window

    w_dup = Window.partitionBy(dup_key)
    w_uni = Window.partitionBy(unique_key)
    keep_keys = (
        files.select(dup_key, unique_key)
        .withColumn("_n_dup", F.count("*").over(w_dup))
        .withColumn("_n_uni", F.count("*").over(w_uni))
        .filter((F.col("_n_dup") >= 2) & (F.col("_n_uni") == 1))
        .select(unique_key)
    )
    return files.join(keep_keys, unique_key, "left_semi")
