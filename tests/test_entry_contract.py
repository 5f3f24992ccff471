"""Mini-driver harness: every oracle-backed queries() entry must match
its oracle_sql() on DuckDB at sf0.001 — same columns, same row count,
same values (order-insensitive). Catches contract drift before the
real driver runs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    missing = [k for k in ORACLE_KEYS if k not in qs]
    assert not missing


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF).toPandas()
    duck_pdf = duck.sql(entrymod.oracle_sql()[name]).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), name

    # dtype-KIND parity (int vs float vs object): the real driver hashes
    # typed values, so a DuckDB HUGEINT (→ float/object) against a Spark
    # long hash-mismatches even when the values compare equal — this is
    # exactly the round-1 uncast-sum failure mode
    for c in spark_pdf.columns:
        ka, kb = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        assert ka == kb or {ka, kb} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {ka} (spark) vs {kb} (oracle)"
        )

    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    # numeric columns: exact after the queries' own rounding
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


def test_rows_only_queries_return_rows(spark):
    qs = entrymod.queries()
    for name in ["minhash_signatures", "near_dup_clusters", "language_id"]:
        df = qs[name](spark, SF)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"cluster_id", "dup_count", "bytes_reclaimable", "priority_rank"} <= cols
