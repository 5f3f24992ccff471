"""Phase-1.5 bottom-k sketch screen (operators/verify.py).

The screen exists for one at-scale reason: the fat half of verify (a
full shingle recompute per residual MEMBER plus an array_intersect
join) must scale with the number of *plausible* pairs, not with
containment-tier candidate noise. The round-4 8v32 scaling run showed
verify_edges (63-84 s at 200k files) overtaking the signature stage —
dominated by spurious containment candidates paying the fat path.

Safety property under test: the screen may only drop pairs that are
provably below EVERY acceptance threshold (exact binomial tails, see
config.containment_screen), so the ACCEPTED edge set is invariant.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig
from uncp_spark.fixtures import (
    REPOS_SCHEMA,
    FixtureSpec,
    generate_low_j_containment_rows,
    generate_repos_rows,
)
from uncp_spark.operators.containment_index import combined_candidate_pairs
from uncp_spark.operators.exact import exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.signatures import signature_table
from uncp_spark.operators.verify import (
    _binom_keep_thresholds,
    accept_edges,
    score_pairs,
)

CFG_ON = SimilarityConfig()
CFG_OFF = SimilarityConfig(containment_screen=False)

_W = [f"w{i:03d}" for i in range(400)]


def _junk_rows(n_pairs: int = 6) -> list[tuple]:
    """Size-ratio ~2 file pairs with a shared ~30-token block: real
    overlap (containment ~ 0.3, Jaccard ~ 0.1 — far below every
    threshold), >= 2 shared bottom-k ids, and a shingle-count ratio
    above containment_ratio_min, so they ARE containment-tier
    candidates. (Equal-size overlap junk never reaches verify anymore —
    the candidate tier's ratio floor proves those pairs band-reachable
    and drops them at generation; the spurious class that SURVIVES the
    floor is exactly this one, and the screen must reject it.)"""
    rows = []
    for g in range(n_pairs):
        # per-group vocabulary: groups must share NO tokens, or long
        # consecutive runs recur across groups and accidentally plant
        # true (containment >= 0.9) cross-group pairs
        common = " ".join(f"g{g}c{i}" for i in range(30))
        a_only = " ".join(f"g{g}a{i}" for i in range(70))
        b_only = " ".join(f"g{g}b{i}" for i in range(170))
        rows.append(("o/junk", f"a_{g}.txt", "c", "text",
                     a_only + " " + common, "junk_overlap", 90_000 + g))
        rows.append(("o/junk", f"b_{g}.txt", "c", "text",
                     common + " " + b_only, "junk_overlap", 90_000 + g))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    """Standard fixture corpus + planted low-J containments + junk
    overlaps — every class the screen must route correctly at once."""
    rows = (
        generate_repos_rows(FixtureSpec(n_repos=12, files_per_repo=10))
        + generate_low_j_containment_rows(n_pairs=6)
        + _junk_rows()
    )
    repos = spark.createDataFrame(rows, REPOS_SCHEMA).repartition(8)
    files = ingest(repos).persist()
    sigs = signature_table(
        exact_representatives(files), CFG_ON, include_shingles=False
    ).persist()
    sigs.count()
    yield {"files": files, "sigs": sigs}
    files.unpersist()
    sigs.unpersist()


def _edges(corpus, cfg):
    pairs, _hb, _hs = combined_candidate_pairs(corpus["sigs"], cfg)
    scored = score_pairs(pairs, corpus["sigs"], cfg, files=corpus["files"])
    return accept_edges(scored, cfg), scored


def test_screen_preserves_accepted_edges(corpus):
    """The one invariant that matters: screen on/off produce the SAME
    edges (src, dst, edge_type) on a corpus containing exact, near,
    contained, low-J contained, boilerplate and junk-overlap classes."""
    on, _ = _edges(corpus, CFG_ON)
    off, _ = _edges(corpus, CFG_OFF)
    e_on = {(r.src, r.dst, r.edge_type) for r in on.collect()}
    e_off = {(r.src, r.dst, r.edge_type) for r in off.collect()}
    assert e_on == e_off
    assert e_on, "fixture must actually produce edges"


def test_screen_skips_fat_path_for_junk_overlap(corpus):
    """Junk-overlap pairs are candidates (>= 2 shared sketch ids) but
    the screen certifies them below threshold: with the screen on their
    scored rows carry containment = NULL (fat path never ran); off, the
    fat path computes their true ~0.3 containment. Neither arm accepts
    them."""
    junk = corpus["files"].filter(F.col("dup_class") == "junk_overlap")
    ids = [r.file_id for r in junk.select("file_id").collect()]
    assert len(ids) == 12

    edges_on, scored_on = _edges(corpus, CFG_ON)
    rows_on = scored_on.filter(
        F.col("src").isin(ids) & F.col("dst").isin(ids)
    ).collect()
    assert rows_on, "junk pairs must still be candidates (the screen is "\
                    "pointless on a corpus where they never reach verify)"
    assert all(r.containment is None for r in rows_on), \
        "screen ON: junk pairs must skip the fat containment evaluation"

    _, scored_off = _edges(corpus, CFG_OFF)
    rows_off = scored_off.filter(
        F.col("src").isin(ids) & F.col("dst").isin(ids)
    ).collect()
    assert rows_off and all(r.containment is not None for r in rows_off), \
        "screen OFF: the fat path must evaluate the same pairs"
    assert all(r.containment < CFG_ON.containment_threshold for r in rows_off)

    accepted = {(r.src, r.dst) for r in edges_on.collect()}
    assert not any((a, b) in accepted for a in ids for b in ids)


def test_screen_keeps_low_j_containment_pairs(corpus):
    """High size-ratio containment pairs sit where the sketch has little
    evidence (d ~ m/r small): the exact-binomial keep threshold falls to
    <= min_shared there, so the screen is structurally unable to drop
    them — they reach the fat path and become containment edges."""
    edges_on, scored_on = _edges(corpus, CFG_ON)
    planted = corpus["files"].filter(F.col("dup_class") == "contained_low_j")
    ids = [r.file_id for r in planted.select("file_id").collect()]
    got = {
        (r.src, r.dst): r.edge_type
        for r in edges_on.filter(
            F.col("src").isin(ids) & F.col("dst").isin(ids)
        ).collect()
    }
    assert len(got) == 6
    assert all(t == "containment" for t in got.values())
    # and their containment was EXACTLY evaluated (fat path), not guessed
    fat = scored_on.filter(
        F.col("src").isin(ids) & F.col("dst").isin(ids)
    ).collect()
    assert all(r.containment is not None and r.containment >= 0.9 for r in fat)


def test_binom_keep_thresholds_shape():
    """Exact-tail lookup sanity: monotone in d, inert for small d (the
    high-ratio regime), decisive for large d (the same-size junk
    regime), and the tail guarantee holds at spot-checked points."""
    kc = _binom_keep_thresholds(256, 0.9, 1e-5)
    kj = _binom_keep_thresholds(256, 0.7, 1e-3)
    assert len(kc) == 257 and len(kj) == 257
    assert all(kc[d + 1] >= kc[d] for d in range(256))
    assert kc[4] == 0            # d <= 4: screen cannot drop anything
    assert kc[5] <= 2            # min_shared >= 2 always clears it
    assert kc[128] > 0.7 * 128   # same-size junk must show near-0.9 rate

    def cdf(x, d, p):
        return sum(
            math.comb(d, i) * p**i * (1 - p) ** (d - i) for i in range(x + 1)
        )

    for d in (8, 16, 64, 128):
        if kc[d] > 0:
            assert cdf(kc[d] - 1, d, 0.9) <= 1e-5 < cdf(kc[d], d, 0.9)
        if kj[d] > 0:
            assert cdf(kj[d] - 1, d, 0.7) <= 1e-3 < cdf(kj[d], d, 0.7)
