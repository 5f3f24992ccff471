"""Containment candidate tier: recall beyond MinHash-LSH reach.

The round-3 verdict's at-scale defect #2: the containment predicate
(``containment >= 0.9``) was only ever evaluated on LSH candidates, so a
small file verbatim-contained in a much larger one (Jaccard ~0.03 —
never band-collides) could not fire the exact tier it exists for. The
bottom-m sketch index (operators/containment_index.py) must surface
those pairs; this module is the planted recall gate.

Reference anchor: uncp DESIGN.md:231-258 (content-aware tier, designed
only); north_rule "file A = a block of file B plus extra code".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig
from uncp_spark.fixtures import REPOS_SCHEMA, generate_low_j_containment_rows
from uncp_spark.operators.containment_index import (
    combined_candidate_pairs,
    containment_candidates,
)
from uncp_spark.operators.exact import exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.lsh import candidate_pairs
from uncp_spark.operators.signatures import signature_table
from uncp_spark.operators.verify import accept_edges, score_pairs

CFG = SimilarityConfig()
N_PAIRS = 12


@pytest.fixture(scope="module")
def planted(spark):
    rows = generate_low_j_containment_rows(n_pairs=N_PAIRS)
    repos = spark.createDataFrame(rows, REPOS_SCHEMA).repartition(8)
    files = ingest(repos).persist()
    sigs = (
        signature_table(exact_representatives(files), CFG,
                        include_shingles=False)
        .persist()
    )
    sigs.count()
    # planted (small, big) id pairs, ordered (src < dst) like the engine
    idx = {
        (r.dup_group, r.path.startswith("blocks/")): r.file_id
        for r in files.filter(F.col("dup_class") == "contained_low_j")
        .select("file_id", "path", "dup_group").collect()
    }
    want = {
        tuple(sorted((idx[(g, True)], idx[(g, False)])))
        for g in range(10_000, 10_000 + N_PAIRS)
    }
    yield {"files": files, "sigs": sigs, "want": want}
    files.unpersist()
    sigs.unpersist()


def _pair_set(df):
    return {(r.src, r.dst) for r in df.select("src", "dst").collect()}


def test_planted_pairs_are_below_lsh_reach(planted):
    """Precondition: the fixture is genuinely out of the band tier's
    reach (J ~ 1/30 << 0.7 threshold) — otherwise this gate proves
    nothing. No planted pair may band-collide."""
    lsh_pairs, _ = candidate_pairs(planted["sigs"], CFG)
    assert planted["want"] & _pair_set(lsh_pairs) == set()


def test_containment_candidates_recall_planted_pairs(planted):
    """The sketch index must propose EVERY planted pair: deterministic
    corpus + deterministic shingle ids, expected miss rate per pair
    exp(-m/r) = exp(-256/30) ~ 2e-4."""
    cand, hot = containment_candidates(planted["sigs"], CFG)
    got = _pair_set(cand)
    missing = planted["want"] - got
    assert not missing, f"containment tier missed {len(missing)} planted pairs"


def test_low_j_containment_pairs_become_edges(planted):
    """End-to-end through verify: candidates survive scoring with
    edge_type='containment' (exact shingle containment = 1.0, exact
    Jaccard < 0.1 — accepted ONLY via the containment predicate)."""
    pairs, _hb, _hs = combined_candidate_pairs(planted["sigs"], CFG)
    scored = score_pairs(pairs, planted["sigs"], CFG, files=planted["files"])
    edges = accept_edges(scored, CFG).persist()
    got = {
        (r.src, r.dst): r.edge_type
        for r in edges.select("src", "dst", "edge_type").collect()
    }
    for p in planted["want"]:
        assert p in got, f"planted containment pair {p} not accepted"
        assert got[p] == "containment", (p, got[p])
    # sanity: the planted pairs' exact Jaccard really is low
    low_j = scored.filter(
        (F.col("containment") >= 0.9) & (F.col("jaccard") < 0.1)
    )
    assert low_j.count() >= N_PAIRS
    edges.unpersist()


def test_hot_shingle_buckets_are_capped_and_reported(spark):
    """A shingle shared by more than hot_shingle_cap files is dropped
    from candidate generation AND surfaced in the report — the no-silent-
    caps discipline of the band tier, mirrored."""
    cfg = SimilarityConfig(hot_shingle_cap=3)
    # 6 files sharing one tiny content block -> every sketch id is shared
    # by 6 > 3 files ... but identical content would collapse in the
    # exact tier, so vary a token per file while keeping one shared
    # 5-token run that shingles identically across all six.
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("o/r", f"f{i}.txt", "c", "text", f"{shared} uniq{i}", "near", 1)
        for i in range(6)
    ]
    files = ingest(spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, dup_class string, dup_group long"))
    sigs = signature_table(exact_representatives(files), cfg,
                           include_shingles=False)
    cand, hot = containment_candidates(sigs, cfg)
    hot_rows = hot.collect()
    assert hot_rows, "over-cap shingle bucket must be reported"
    assert all(r.bucket_size > cfg.hot_shingle_cap for r in hot_rows)
    # pairs from the hot shingle are dropped (capped), not exploded
    n_pairs = cand.count()
    assert n_pairs < 15  # 6 choose 2 per shared shingle would exceed this
