"""Physical-plan audits — the plan you'd want at 100 TB, asserted.

Correctness tests prove the answers; these prove the *shape*: filters
and projections reach the parquet scan, small dimensions broadcast, the
production priority rank never plans a single-partition global window,
and the LSH candidate stage contains no cartesian product. A regression
here is invisible at sf0.01 and fatal at 100 TB, so it's pinned by test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uncp_spark.config import SimilarityConfig

CFG = SimilarityConfig()
SF_DIR = "/root/testdata/sf0.001"


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _fmt(
        docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: the scan reads 2 columns, not text/source/etc.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_small_dim_join_broadcasts(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    plan = _fmt(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_priority_rank_has_no_global_window(spark):
    """Production ranking (banded rank + offset join) must not contain a
    partition-less window over the full cluster set."""
    from uncp_spark.fixtures import repos_from_documents
    from uncp_spark.operators.components import label_all
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.operators.priority import cluster_stats, priority_ranked

    files = ingest(repos_from_documents(spark, SF_DIR))
    labeled = label_all(files, files.select(
        "file_id", F.xxhash64("sha256").alias("cluster_id")
    ))
    ranked = priority_ranked(cluster_stats(labeled))
    plan = _fmt(ranked)
    for line in plan.splitlines():
        if "Window" in line and "partition" not in line.lower():
            # formatted plans print window specs with partitionBy args;
            # a truly global window renders an empty partition clause
            assert "windowspecdefinition(" not in line or \
                   not _is_global_windowspec(line), line


def _is_global_windowspec(line: str) -> bool:
    # windowspecdefinition(<partition cols...>, <order cols...>, frame)
    # a global window starts its spec directly with an order expression:
    # windowspecdefinition(x DESC NULLS LAST, ...)
    import re

    for m in re.finditer(r"windowspecdefinition\(([^()]*)", line):
        head = m.group(1).split(",")[0].strip()
        if " ASC" in head or " DESC" in head:
            return True
    return False


def test_lsh_pipeline_has_no_cartesian_product(spark):
    from uncp_spark.fixtures import repos_from_documents
    from uncp_spark.operators.exact import exact_representatives
    from uncp_spark.operators.ingest import ingest
    from uncp_spark.operators.lsh import candidate_pairs
    from uncp_spark.operators.shingle import with_shingles
    from uncp_spark.operators.signatures import with_signatures
    from uncp_spark.operators.verify import accept_edges, score_pairs

    files = ingest(repos_from_documents(spark, SF_DIR))
    sigs = with_signatures(
        with_shingles(exact_representatives(files), CFG), CFG
    )
    pairs, _hot = candidate_pairs(sigs, CFG)
    edges = accept_edges(score_pairs(pairs, sigs, CFG), CFG)
    plan = _fmt(edges)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ingest_stays_in_codegen(spark):
    """The ingest stage (sha256/size/depth/...) is pure JVM expressions:
    no Python evals anywhere in its plan."""
    from uncp_spark.fixtures import repos_from_documents
    from uncp_spark.operators.ingest import ingest

    plan = _fmt(ingest(repos_from_documents(spark, SF_DIR)))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # formatted mode marks codegen stages with '*' (simple mode spells
    # out WholeStageCodegen); the projection chain must carry it
    assert "* Project" in plan
