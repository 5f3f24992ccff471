"""Driver-corpus low-Jaccard containment: the ``bundle/`` branch of
``repos_from_documents`` (fixtures.py) plants verbatim-contained member
documents at size ratios up to ~13, so the END-TO-END near-dup oracle
(__spark_entry__.q_near_dup_clusters, hash-compared against the DuckDB
twin by the driver) witnesses the bottom-k containment-sketch candidate
tier — not just the pytest fixtures.

This module pins the two facts that make that witness meaningful:
the high-ratio member pairs are genuinely OUTSIDE MinHash-LSH band
reach, and the combined candidate tier still accepts every member↔bundle
pair as a containment edge.

Reference anchor: uncp DESIGN.md:231-258 (content-aware containment
tier, designed only); north_rule "file A = a block of file B plus extra
code".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig
from uncp_spark.fixtures import repos_from_documents
from uncp_spark.operators.containment_index import combined_candidate_pairs
from uncp_spark.operators.exact import exact_representatives
from uncp_spark.operators.ingest import ingest
from uncp_spark.operators.lsh import candidate_pairs
from uncp_spark.operators.signatures import signature_table
from uncp_spark.operators.verify import accept_edges, score_pairs

CFG = SimilarityConfig()
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    files = ingest(repos_from_documents(spark, SF_DIR)).persist()
    reps = exact_representatives(files)
    sigs = signature_table(reps, CFG, include_shingles=False).persist()
    sigs.count()

    # member↔bundle ground truth from the corpus construction itself:
    # every doc with length(text) >= 300 in a %4==0 window of 12 is
    # verbatim-contained in that window's bundle file. Map both sides
    # to their exact-dup REPRESENTATIVE ids (a member's rep may be its
    # mirror/ copy) via sha256.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    members = (
        docs.filter(F.col("text").isNotNull() & (F.length("text") >= 300))
        .filter((F.floor(F.col("doc_id") / 12) % 4) == 0)
        .select(
            F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.concat(F.lit("bundles/bundle_"),
                     F.floor(F.col("doc_id") / 12).cast("string"),
                     F.lit(".txt")).alias("bundle_path"),
        )
    )
    rep_of = sigs.select("file_id", "sha256", "n_shingles")
    sha_of = files.select("path", "sha256").distinct()
    pairs = (
        members.join(sha_of, "path")
        .join(rep_of.withColumnsRenamed(
            {"file_id": "member_id", "n_shingles": "member_n"}), "sha256")
        .drop("sha256")
        .join(sha_of.withColumnsRenamed(
            {"path": "bundle_path", "sha256": "bsha"}), "bundle_path")
        .join(rep_of.withColumnsRenamed(
            {"file_id": "bundle_id", "sha256": "bsha",
             "n_shingles": "bundle_n"}), "bsha")
        .select("member_id", "bundle_id",
                (F.col("bundle_n") / F.col("member_n")).alias("ratio"))
        .collect()
    )
    assert len(pairs) >= 20, "corpus lost its planted bundle members"
    want = {
        (min(r.member_id, r.bundle_id), max(r.member_id, r.bundle_id)): r.ratio
        for r in pairs
    }
    yield {"files": files, "sigs": sigs, "want": want}
    files.unpersist()
    sigs.unpersist()


def _pair_set(df):
    return {(r.src, r.dst) for r in df.select("src", "dst").collect()}


def test_high_ratio_members_are_beyond_lsh_reach(corpus):
    """The witness is only meaningful if LSH alone cannot surface the
    high-ratio member pairs (J = 1/ratio ≲ 0.125 ⇒ per-pair band
    collision P ≈ 32·J⁴ ≲ 8e-3)."""
    high = {p for p, ratio in corpus["want"].items() if ratio >= 8}
    assert len(high) >= 3, "corpus no longer has high-ratio bundle members"
    lsh_pairs, _ = candidate_pairs(corpus["sigs"], CFG)
    unreached = high - _pair_set(lsh_pairs)
    # one lucky band collision among the high-ratio pairs is within the
    # construction's odds (per-pair P ≈ 32·J⁴, deterministic for this
    # corpus — exactly 1 observed at sf0.001); the witness needs a
    # SURPLUS of pairs only the sketch tier can propose, not unanimity
    assert len(unreached) >= 3, (
        f"only {len(unreached)} high-ratio containment pairs are beyond "
        f"LSH reach — the bundle witness no longer exercises the sketch "
        f"tier"
    )


def test_every_bundle_member_is_accepted_as_containment_edge(corpus):
    """Combined tier → verify → accept: every member↔bundle pair must
    survive as an edge (containment = 1.0 by construction), including
    the high-ratio ones only the sketch index can propose."""
    pairs, _hb, _hs = combined_candidate_pairs(corpus["sigs"], CFG)
    scored = score_pairs(pairs, corpus["sigs"], CFG, files=corpus["files"])
    edges = accept_edges(scored, CFG)
    got = _pair_set(edges)
    missing = set(corpus["want"]) - got
    assert not missing, (
        f"{len(missing)} bundle-member containment pairs missing from "
        f"accepted edges (ratios: "
        f"{[round(corpus['want'][p], 1) for p in missing]})"
    )
