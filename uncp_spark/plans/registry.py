"""X1/X2 — pluggable similarity scorers and typed relation registries.

Reference parity: uncp DESIGNS (never ships) a ``SimilarityProvider``
trait — name, priority, can_compare, compute_similarity — selected per
pair (DESIGN.md:240-258), and a typed relation registration protocol —
``RelationKey``: name, description, schema, version
(src/relations.rs:44-66). Spark-first re-expression: a provider is a
*vectorized* scorer ``DataFrame[pairs] → DataFrame[edges]`` (never a
per-pair callback — that would be a per-row UDF), and a relation is a
named producer ``DataFrame[files] → DataFrame`` with a declared schema
that is validated on build.

Both registries are plain dicts with register/get/list; built-ins are
registered at import so ``get_scorer("minhash")`` works out of the box
and adding a 4th similarity tier means one ``register_scorer`` call —
no edits to verify.py or pipeline.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from uncp_spark.config import SimilarityConfig

# ------------------------------------------------------------- scorers (X1)

# a scorer takes (pairs(src,dst,...), sigs, cfg[, files]) and returns
# accepted edges (src, dst, score, edge_type) — the vectorized analogue
# of SimilarityProvider.compute_similarity over a whole candidate table.
# The optional 4th param is the files table (content), for scorers that
# recompute exact shingle sets for residual candidates instead of
# requiring the signature table to carry them (the production default);
# 3-arg scorers remain valid (apply_scorer dispatches by arity).
ScorerFn = Callable[..., DataFrame]


@dataclass(frozen=True)
class ScorerSpec:
    name: str
    fn: ScorerFn
    priority: int = 100          # higher runs first, DESIGN.md:244
    description: str = ""


_SCORERS: dict[str, ScorerSpec] = {}


def register_scorer(name: str, fn: ScorerFn, priority: int = 100,
                    description: str = "") -> ScorerSpec:
    spec = ScorerSpec(name, fn, priority, description)
    _SCORERS[name] = spec
    return spec


def get_scorer(name: str) -> ScorerSpec:
    try:
        return _SCORERS[name]
    except KeyError:
        raise KeyError(
            f"unknown scorer {name!r}; registered: {sorted(_SCORERS)}"
        ) from None


def list_scorers() -> list[ScorerSpec]:
    return sorted(_SCORERS.values(), key=lambda s: -s.priority)


def apply_scorer(spec: ScorerSpec, pairs: DataFrame, sigs: DataFrame,
                 cfg: SimilarityConfig, files: DataFrame | None = None) -> DataFrame:
    """Invoke a scorer, passing ``files`` only when its signature can
    accept it — keeps pre-existing 3-arg custom scorers working.

    Dispatch binds against the actual signature rather than counting
    parameters, so ``*args``/``**kwargs`` scorers receive ``files``
    positionally, a keyword-only ``files`` parameter receives it by
    name, and plain 3-arg scorers are called without it."""
    import inspect

    try:
        sig = inspect.signature(spec.fn)
    except (TypeError, ValueError):
        return spec.fn(pairs, sigs, cfg, files)
    for args, kwargs in (
        ((pairs, sigs, cfg, files), {}),
        ((pairs, sigs, cfg), {"files": files}),
        ((pairs, sigs, cfg), {}),
    ):
        try:
            ba = sig.bind(*args, **kwargs)
        except TypeError:
            continue
        return spec.fn(*ba.args, **ba.kwargs)
    raise TypeError(
        f"scorer {spec.name!r} signature {sig} cannot accept "
        "(pairs, sigs, cfg[, files])"
    )


# ----------------------------------------------------------- relations (X2)

RelationProducer = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class RelationSpec:
    """RelationKey parity (src/relations.rs:44-66): name, description,
    schema, version — plus the producer that builds the relation table
    from the files table and the key columns its persisted store merges
    on (uncp's relation-store merge across saves,
    src/relations.rs:285-293)."""

    name: str
    description: str
    schema: tuple[str, ...]      # required output column names
    producer: RelationProducer = field(compare=False)
    version: int = 1
    # merge-on-save identity: a later save's rows win per these columns
    # (defaults to the first schema column — every uncp relation keys on
    # its leading group column)
    merge_keys: tuple[str, ...] = ()

    def effective_merge_keys(self) -> tuple[str, ...]:
        return self.merge_keys or self.schema[:1]


_RELATIONS: dict[str, RelationSpec] = {}


def register_relation(name: str, description: str, schema: list[str],
                      producer: RelationProducer, version: int = 1,
                      merge_keys: list[str] | None = None) -> RelationSpec:
    spec = RelationSpec(name, description, tuple(schema), producer, version,
                        tuple(merge_keys or ()))
    _RELATIONS[name] = spec
    return spec


def get_relation(name: str) -> RelationSpec:
    try:
        return _RELATIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown relation {name!r}; registered: {sorted(_RELATIONS)}"
        ) from None


def list_relations() -> list[RelationSpec]:
    return sorted(_RELATIONS.values(), key=lambda r: r.name)


def build_relation(name: str, files: DataFrame) -> DataFrame:
    """Build a registered relation and validate its declared schema —
    the typed-store guarantee of src/relations.rs:169-267."""
    spec = get_relation(name)
    out = spec.producer(files)
    missing = [c for c in spec.schema if c not in out.columns]
    if missing:
        raise ValueError(
            f"relation {name!r} producer output misses declared columns "
            f"{missing}; got {out.columns}"
        )
    return out


def save_relation(name: str, files: DataFrame, store_dir: str,
                  config_hash: str, input_token: str):
    """Build a registered relation from this scan's files and MERGE it
    into its persisted store: a later save's rows win per the spec's
    merge keys, keys seen only by earlier scans survive — uncp's
    relation merge-on-save (src/relations.rs:285-293 via
    persist.rs:208-233), so repeated scans accumulate the union of
    their relations. Returns the checkpoint StageResult.

    The spec's ``version`` is STAMPED into the store manifest and
    ENFORCED on every later save (RelationKey::version parity,
    src/relations.rs:58-61; persisted meta version, src/persist.rs:15-20):
    merging v2 rows into a v1 store would silently mix columns whose
    meaning changed between versions, so a version mismatch refuses
    loudly — delete/migrate the store explicitly."""
    import os

    from uncp_spark.sources.checkpoint import (
        merge_checkpoint,
        read_manifest,
        recover_merge_target,
    )

    spec = get_relation(name)
    path = os.path.join(store_dir, name)
    recover_merge_target(path)  # the manifest we version-check must be live
    old = read_manifest(path)
    if old is not None:
        stored = old.get("relation_version", 1)
        if stored != spec.version:
            from uncp_spark.errors import VersionMismatchError

            raise VersionMismatchError(
                f"relation {name!r} store at {path} holds schema version "
                f"{stored} but the registered producer declares version "
                f"{spec.version}; refusing to merge mixed schemas — "
                f"migrate or remove the store first"
            )
    out = build_relation(name, files)
    return merge_checkpoint(
        out, path, name, config_hash, input_token,
        keys=list(spec.effective_merge_keys()),
        extra={"relation_version": spec.version},
    )


# ------------------------------------------------------------- built-ins

def _register_builtins() -> None:
    from uncp_spark.operators.exact import (
        exact_clusters,
        same_name_groups,
        same_size_groups,
    )
    from uncp_spark.operators.verify import accept_edges, score_pairs

    def minhash_scorer(pairs, sigs, cfg, files=None):
        return accept_edges(score_pairs(pairs, sigs, cfg, files), cfg)

    register_scorer(
        "minhash_simhash_containment", minhash_scorer, priority=100,
        description="two-phase MinHash est-Jaccard / SimHash hamming / "
                    "exact shingle containment (the default fuzzy tier)",
    )

    register_relation(
        "identical_hashes", "files sharing a content hash (IdenticalHashes, "
        "src/relations.rs:327-339)",
        ["hash_value", "file_paths", "file_count", "total_size"],
        exact_clusters,
    )
    register_relation(
        "same_name", "files sharing a filename (SameName relation, "
        "src/relations.rs:352-366)",
        ["filename_key", "file_paths", "file_count", "total_size"],
        same_name_groups,
    )
    register_relation(
        "same_size", "files sharing a byte size (SameSize relation, "
        "src/relations.rs:377-391)",
        ["size_bytes", "file_paths", "file_count"],
        same_size_groups,
    )


_register_builtins()
